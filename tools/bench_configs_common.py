"""Shared synthetic-sequence setup for the TPU bench tools."""

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")


def parse_size(s):
    s = s.lower()
    mult = 1
    if s.endswith("k"):
        mult, s = 1000, s[:-1]
    elif s.endswith("m"):
        mult, s = 1_000_000, s[:-1]
    return int(float(s) * mult)


class BenchEnv:
    """Pre-rendered synthetic 640x480 sequence resident on the device, plus
    the per-frame preprocess+fusion step (identical to bench.py's)."""

    W, H = 640, 480
    SCALE = 5000.0
    K = 8
    NUM_FRAMES = 40

    def __init__(self, trajectory: str = "arc"):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from surfelmeshing_tpu.io.synthetic import SyntheticRGBDSequence

        self.jax, self.jnp, self.np = jax, jnp, np
        seq = SyntheticRGBDSequence(num_frames=self.NUM_FRAMES, width=self.W,
                                    height=self.H, noise_sigma=0.002,
                                    trajectory=trajectory)
        self.seq = seq
        self.cam = seq.camera
        device = jax.devices()[0]
        self.depths, self.colors = [], []
        for i in range(self.NUM_FRAMES):
            d, c = seq.depth_and_color(i)
            self.depths.append(jax.device_put(jnp.asarray(d), device))
            self.colors.append(jax.device_put(
                jnp.asarray(np.ascontiguousarray(c.transpose(2, 0, 1))),
                device))
        self.pp_kwargs = dict(
            sigma_xy=3.0, sigma_value_factor=0.05, radius_factor=2.0,
            max_depth_u16=int(self.SCALE * 3.0),
            depth_valid_region_radius=333.0,
            tolerance=0.02, required_inliers=None, erosion_radius=2,
            observation_angle_threshold_deg=85.0, depth_scaling=self.SCALE,
            point_radius_extension_factor=1.5,
            point_radius_clamp_factor=float("inf"),
            fx=self.cam.fx, fy=self.cam.fy, cx=self.cam.cx, cy=self.cam.cy)
        self.lo, self.hi = self.K // 2, self.NUM_FRAMES - self.K // 2

    def make_params(self, budget=0, tile=4096):
        from surfelmeshing_tpu.ops.fusion import FusionParams
        cam = self.cam
        return FusionParams(
            width=self.W, height=self.H, fx=cam.fx, fy=cam.fy, cx=cam.cx,
            cy=cam.cy, depth_scaling=self.SCALE, do_blending=True,
            regularization_iterations=1, active_surfel_budget=budget,
            tile_size=tile)

    def transforms_for(self, i):
        np, jnp = self.np, self.jnp
        ref = self.seq.poses[i].scaled_translation(self.SCALE)
        mats = []
        for off in list(range(-self.K // 2, 0)) + \
                list(range(1, self.K // 2 + 1)):
            other = self.seq.poses[i + off].scaled_translation(self.SCALE)
            mats.append((ref.inverse() * other).inverse().matrix3x4())
        return jnp.asarray(np.stack(mats).astype(np.float32))

    def step(self, state, i, params, integrate):
        jnp, np = self.jnp, self.np
        from surfelmeshing_tpu.ops import preprocess as pp
        others = jnp.stack([self.depths[i + off]
                            for off in list(range(-self.K // 2, 0)) +
                            list(range(1, self.K // 2 + 1))])
        d, normals, radius = pp.preprocess_frame(
            self.depths[i], others, self.transforms_for(i), **self.pp_kwargs)
        T_gl = jnp.asarray(self.seq.poses[i].matrix3x4().astype(np.float32))
        T_lg = jnp.asarray(
            self.seq.poses[i].inverse().matrix3x4().astype(np.float32))
        return integrate(state, d, normals, radius, self.colors[i],
                         T_gl, T_lg, self.jnp.int32(i), params)


def build_inputs():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return BenchEnv()


class AutoBudgetPolicy:
    """The pipeline's --active_surfel_budget -1 policy for standalone
    tools: lagged (surfel_count, active_tile_count) readbacks size the
    next frame's tiling budget to 2x the visible-set tile demand on a
    power-of-2 tile ladder (pipeline._auto_budget; VERDICT r3 #4)."""

    def __init__(self, cap, tile, max_creations, width, height):
        self.cap, self.tile = cap, tile
        c_floor = min(max_creations, width * height)
        self.floor_tiles = c_floor // tile + 2
        self.max_creations = max_creations
        self.lag_count = 0
        self.lag_tiles = 0
        self.pending = []
        self.budgets_used = set()

    def params_for_frame(self, params):
        import dataclasses

        import jax
        import numpy as np
        while self.pending and self.pending[0].is_ready():
            v = np.asarray(jax.device_get(self.pending.pop(0)))
            self.lag_count, self.lag_tiles = int(v[0]), int(v[1])
        if self.lag_tiles > 0:
            want = 2 * self.lag_tiles
        else:
            want = -(-2 * max(self.lag_count + 2 * self.max_creations, 1)
                     // self.tile)
        tiles = 1 << (max(self.floor_tiles, want) - 1).bit_length()
        b = int(min(tiles * self.tile, self.cap))
        self.budgets_used.add(b)
        return dataclasses.replace(params, active_surfel_budget=b)

    def observe(self, state):
        import jax.numpy as jnp
        h = jnp.stack([state.surfel_count, state.active_tile_count])
        self.pending.append(h)
        try:
            h.copy_to_host_async()
        except AttributeError:
            pass
