"""NumPy golden oracle for the 8 fusion phases.

An independent, literal-semantics re-implementation of the reference CUDA
fusion kernels (cuda_surfel_reconstruction_kernels.cu), used to verify
ops/fusion.py phase by phase (via fusion._TAP under jax.disable_jit).

Where the TPU implementation deviates from CUDA by documented design, the
oracle implements the *documented contract*, independently:
- conflict/supporter arbitration: deterministic min-index winner instead of
  the CUDA atomicCAS race (fusion.py phase 2);
- support count + depth sum ride one fixed-point i32 accumulator
  (fusion.py phase 2);
- measurement blending uses Jacobi ring iterations instead of the CUDA
  in-place BFS races (kernels.cu:610,676,699 mark those races benign);
- symmetric (gather-based) regularization cross terms (fusion.py phase 8).

All math in float32 via vectorized numpy (python-scalar float64 promotion
would silently change rounding).
"""

import numpy as np

INVALID = 2**31 - 1
F32 = np.float32


def _f(x):
    return np.asarray(x, F32)


class Oracle:
    """Mirror of SurfelState in plain numpy arrays."""

    def __init__(self, pack, neighbors, count, merge_count=0,
                 nbr_dist=None):
        from surfelmeshing_tpu.ops import fusion as FU
        self.F = FU
        self.pack = np.array(pack, F32)          # (N, PACK_WIDTH)
        self.neighbors = np.array(neighbors, np.int32)
        # Stored squared slot distances (fast_neighbor_update semantics).
        self.nbr_dist = (np.full(self.neighbors.shape, np.inf, F32)
                         if nbr_dist is None else np.array(nbr_dist, F32))
        self.count = int(count)
        self.merge_count = int(merge_count)

    # -- column accessors ---------------------------------------------------
    def col(self, c):
        return self.pack[:, c]

    def icol(self, c):
        return self.pack[:, c].view(np.int32)

    def run_frame(self, depth, normals_xy, radius_img, color,
                  T_gl, T_lg, frame, p):
        """Full 8-phase integrate; returns a dict of phase outputs."""
        F = self.F
        h, w = depth.shape
        hw = h * w
        n = self.pack.shape[0]
        out = {}
        noise = F32(p.sensor_noise_factor)
        one = F32(1.0)
        T_lg = _f(T_lg)
        T_gl = _f(T_gl)

        # Shared projection of raw positions (kernels.cu:1481-1493).
        ox, oy, oz = self.col(F.PX), self.col(F.PY), self.col(F.PZ)
        lx = T_lg[0, 0] * ox + T_lg[0, 1] * oy + T_lg[0, 2] * oz + T_lg[0, 3]
        ly = T_lg[1, 0] * ox + T_lg[1, 1] * oy + T_lg[1, 2] * oz + T_lg[1, 3]
        z = T_lg[2, 0] * ox + T_lg[2, 1] * oy + T_lg[2, 2] * oz + T_lg[2, 3]
        safe_z = np.where(z > 0, z, one)
        u = F32(p.fx) * (lx / safe_z) + F32(p.cx)
        v = F32(p.fy) * (ly / safe_z) + F32(p.cy)
        px = u.astype(np.int32)
        py = v.astype(np.int32)
        in_image = (z > 0) & (u >= 0) & (v >= 0) & (px < w) & (py < h)

        idx = np.arange(n, dtype=np.int32)
        stamps = self.icol(F.STAMP)
        in_count = idx < self.count
        active = in_count & (stamps > frame - p.active_window)

        # Side pixel from the sub-pixel position (kernels.cu:1506-1555).
        x_frac = u - px.astype(F32)
        y_frac = v - py.astype(F32)
        bl = x_frac < y_frac
        near = x_frac < one - y_frac
        left = bl & near
        bottom = bl & ~near
        top = ~bl & near
        right = ~bl & ~near
        sx = np.where(left, px - 1, np.where(right, px + 1, px))
        sy = np.where(top, py - 1, np.where(bottom, py + 1, py))
        side_ok = np.where(
            left, px > 1,
            np.where(right, px < w - 1, np.where(top, py > 0, py < h - 1)))

        proj_a = active & in_image
        proj_b = proj_a & side_ok
        pix_a = np.where(proj_a, py * w + px, 0)
        pix_b = np.where(proj_b, sy * w + sx, 0)

        # --- Phase 1: min-depth raster (kernels.cu:1458-1557) -------------
        first = np.full(hw, np.inf, F32)
        np.minimum.at(first, pix_a[proj_a], z[proj_a])
        np.minimum.at(first, pix_b[proj_b], z[proj_b])
        out["first_depth"] = first

        # --- Phase 2: association (kernels.cu:1586-1854) -------------------
        depth_m = depth.reshape(hw).astype(F32) * F32(1.0 / p.depth_scaling)
        mnx = _f(normals_xy[0]).reshape(hw)
        mny = _f(normals_xy[1]).reshape(hw)
        mnz = -np.sqrt(np.maximum(F32(0.0), one - mnx * mnx - mny * mny))
        radius_flat = _f(radius_img).reshape(hw)

        snx = T_lg[0, 0] * self.col(F.NX) + T_lg[0, 1] * self.col(F.NY) \
            + T_lg[0, 2] * self.col(F.NZ)
        sny = T_lg[1, 0] * self.col(F.NX) + T_lg[1, 1] * self.col(F.NY) \
            + T_lg[1, 2] * self.col(F.NZ)
        snz = T_lg[2, 0] * self.col(F.NX) + T_lg[2, 1] * self.col(F.NY) \
            + T_lg[2, 2] * self.col(F.NZ)
        sdist = np.sqrt(lx * lx + ly * ly + z * z)
        facing = (lx * snx + ly * sny + z * snz) / np.maximum(sdist,
                                                              F32(1e-30))
        facing_ok = facing <= F32(0.0)
        cos_compat = F32(p.cos_normal_compat)

        def support_at(pix, on):
            meas = depth_m[pix]
            ok = on & (meas > 0)
            f = first[pix]
            conflict_zone = f < (one - noise) * meas
            ok &= ~conflict_zone
            ok &= ~(z > (one + noise) * meas)
            ok &= facing_ok
            compat = (snx * mnx[pix] + sny * mny[pix] + snz * mnz[pix]) \
                >= cos_compat
            ok &= ~(meas < z) | compat
            return ok

        rad = self.col(F.RAD)
        support_a = support_at(pix_a, proj_a) & (rad > 0)
        support_b = support_at(pix_b, proj_b) & (rad > 0)

        supporting = np.full(hw, INVALID, np.int32)
        np.minimum.at(supporting, pix_a[support_a], idx[support_a])
        np.minimum.at(supporting, pix_b[support_b], idx[support_b])
        # Fixed-point count+sum accumulator (documented TPU contract).
        z_units = np.clip(np.round(z * F32(p.depth_scaling)), 0,
                          (1 << 17) - 1).astype(np.int64)
        packed = np.zeros(hw, np.int64)
        np.add.at(packed, pix_a[support_a],
                  (1 << 25) + z_units[support_a])
        np.add.at(packed, pix_b[support_b],
                  (1 << 25) + z_units[support_b])
        counts = (packed >> 25).astype(np.int32)
        sums = (packed & ((1 << 25) - 1)).astype(F32) \
            * F32(1.0 / p.depth_scaling)
        has_conflict = first < (one - noise) * depth_m
        out["supporting_surfels"] = supporting
        out["support_counts"] = counts
        out["support_depth_sums"] = sums
        out["has_conflict"] = has_conflict

        # --- Phase 3: merge (kernels.cu:1857-2096) -------------------------
        merge_on = in_count & (rad >= 0) & in_image
        m_ok = support_at(pix_a, merge_on)
        supported = supporting[np.where(proj_a | merge_on, pix_a, 0)]
        supported = supporting[pix_a]
        m_ok &= (supported != idx) & (supported != INVALID)
        sup_c = np.clip(supported, 0, n - 1)
        o_rad = rad[sup_c]
        ratio = rad / np.where(o_rad != 0, o_rad, F32(1e-30))
        m_ok &= (ratio <= F32(1.2 ** 2)) & (ratio >= F32(1.0 / 1.2 ** 2))
        ddx = ox - self.col(F.PX)[sup_c]
        ddy = oy - self.col(F.PY)[sup_c]
        ddz = oz - self.col(F.PZ)[sup_c]
        m_ok &= ddx * ddx + ddy * ddy + ddz * ddz <= \
            F32(0.5 * 0.25 * 0.25) * (rad + o_rad)
        m_ok &= (self.col(F.NX) * self.col(F.NX)[sup_c] +
                 self.col(F.NY) * self.col(F.NY)[sup_c] +
                 self.col(F.NZ) * self.col(F.NZ)[sup_c]) >= F32(0.93969)
        out["merge_mask"] = m_ok
        st = self.pack[:, F.STAMP].view(np.int32)
        st[m_ok] = 0
        self.pack[m_ok, F.RAD] = -1.0
        self.pack[m_ok, F.DETACH] = np.maximum(
            self.pack[m_ok, F.DETACH], 1.0)
        self.merge_count += int(m_ok.sum())
        rad = self.col(F.RAD)

        # --- Phase 4: measurement blending (kernels.cu:563-738) ------------
        depth_m_pre = depth_m
        if p.do_blending:
            depth = self._blend(depth, supporting.reshape(h, w),
                                counts.reshape(h, w), sums.reshape(h, w), p)
            depth_m = depth.reshape(hw).astype(F32) \
                * F32(1.0 / p.depth_scaling)
        out["blended_depth"] = depth

        # Global-space measurement point/normal per pixel.
        fx_inv, fy_inv, cx_inv, cy_inv = [F32(t) for t in p.unprojection]
        lin = np.arange(hw, dtype=np.int32)
        xs_f = (lin % w).astype(F32)
        ys_f = (lin // w).astype(F32)
        plx = depth_m * (fx_inv * xs_f + cx_inv)
        ply = depth_m * (fy_inv * ys_f + cy_inv)
        plz = depth_m
        pgx = T_gl[0, 0] * plx + T_gl[0, 1] * ply + T_gl[0, 2] * plz \
            + T_gl[0, 3]
        pgy = T_gl[1, 0] * plx + T_gl[1, 1] * ply + T_gl[1, 2] * plz \
            + T_gl[1, 3]
        pgz = T_gl[2, 0] * plx + T_gl[2, 1] * ply + T_gl[2, 2] * plz \
            + T_gl[2, 3]
        ngx = T_gl[0, 0] * mnx + T_gl[0, 1] * mny + T_gl[0, 2] * mnz
        ngy = T_gl[1, 0] * mnx + T_gl[1, 1] * mny + T_gl[1, 2] * mnz
        ngz = T_gl[2, 0] * mnx + T_gl[2, 1] * mny + T_gl[2, 2] * mnz
        cr = _f(color[0].reshape(hw))
        cg = _f(color[1].reshape(hw))
        cb = _f(color[2].reshape(hw))

        # --- Phase 5: integrate (kernels.cu:741-1142), pixel a then b ------
        base_on = active & in_image & (rad >= 0)
        for pix, on0 in ((pix_a, base_on), (pix_b, base_on & side_ok)):
            meas = depth_m[pix]
            on = on0 & (meas > 0)
            f = first[pix]
            conflict_zone = f < (one - noise) * meas
            # Marker eligibility: only where the PRE-blend zone also held
            # (the reference conflictor map is written pre-blend,
            # kernels.cu:1610-1618; mirrors ops/fusion.integrate_at).
            conflicting = on & conflict_zone & (f == z) & \
                (f < (one - noise) * depth_m_pre[pix])
            on = on & ~conflict_zone & ~(z > (one + noise) * meas)

            conf = self.col(F.CONF).copy()
            new_conf = conf - one
            reinit = conflicting & (new_conf <= 0)
            dec = conflicting & ~reinit
            P = self.pack
            for c, val in ((F.PX, pgx), (F.PY, pgy), (F.PZ, pgz),
                           (F.SX, pgx), (F.SY, pgy), (F.SZ, pgz),
                           (F.NX, ngx), (F.NY, ngy), (F.NZ, ngz),
                           (F.CR, cr), (F.CG, cg), (F.CB, cb)):
                P[reinit, c] = val[pix][reinit]
            P[reinit, F.RAD] = radius_flat[pix][reinit]
            P[reinit, F.CONF] = 1.0
            P[reinit, F.DETACH] = 1.0
            P[:, F.CREATION].view(np.int32)[reinit] = frame
            P[:, F.STAMP].view(np.int32)[reinit] = frame
            P[dec, F.CONF] = new_conf[dec]
            self.neighbors[reinit] = INVALID
            self.nbr_dist[reinit] = np.inf

            # Same-surface checks with (possibly reinit'd) attributes.
            nx_, ny_, nz_ = P[:, F.NX], P[:, F.NY], P[:, F.NZ]
            lsnx = T_lg[0, 0] * nx_ + T_lg[0, 1] * ny_ + T_lg[0, 2] * nz_
            lsny = T_lg[1, 0] * nx_ + T_lg[1, 1] * ny_ + T_lg[1, 2] * nz_
            lsnz = T_lg[2, 0] * nx_ + T_lg[2, 1] * ny_ + T_lg[2, 2] * nz_
            dot_view = (lx * lsnx + ly * lsny + z * lsnz) / \
                np.maximum(sdist, F32(1e-30))
            on &= dot_view <= 0
            compat = (lsnx * mnx[pix] + lsny * mny[pix] +
                      lsnz * mnz[pix]) >= cos_compat
            on &= ~(meas < z) | compat
            on &= P[:, F.RAD] >= 0
            on &= P[:, F.CREATION].view(np.int32) < frame

            weight = one / np.maximum(one, counts[pix].astype(F32))
            conf = P[:, F.CONF].copy()
            norm_factor = one / (conf + weight)
            P[on, F.CONF] = np.minimum(conf + weight,
                                       F32(p.max_surfel_confidence))[on]
            for c, g in ((F.PX, pgx), (F.PY, pgy), (F.PZ, pgz)):
                P[on, c] = ((conf * P[:, c] + weight * g[pix]) *
                            norm_factor)[on]
            bnx = conf * P[:, F.NX] + weight * ngx[pix]
            bny = conf * P[:, F.NY] + weight * ngy[pix]
            bnz = conf * P[:, F.NZ] + weight * ngz[pix]
            bl_ = np.maximum(np.sqrt(bnx * bnx + bny * bny + bnz * bnz),
                             F32(1e-30))
            P[on, F.NX] = (bnx / bl_)[on]
            P[on, F.NY] = (bny / bl_)[on]
            P[on, F.NZ] = (bnz / bl_)[on]
            P[on, F.RAD] = np.minimum(P[:, F.RAD], radius_flat[pix])[on]
            for c, g in ((F.CR, cr), (F.CG, cg), (F.CB, cb)):
                P[on, c] = np.floor((conf * P[:, c] + weight * g[pix]) *
                                    norm_factor + F32(0.5))[on]
            P[on, F.DETACH] = 0.0
            P[:, F.STAMP].view(np.int32)[on] = frame
        out["pack_after_integrate"] = self.pack.copy()
        out["neighbors_after_integrate"] = self.neighbors.copy()

        # --- Phase 6: neighbor update (kernels.cu:1197-1455) ---------------
        P = self.pack
        rad = P[:, F.RAD]
        reg_sq = F32(p.radius_factor_for_regularization_neighbors ** 2)
        border_ok = (px >= 1) & (py >= 1) & (px < w - 1) & (py < h - 1) & \
            (z > 0)
        on = active & border_ok
        meas = depth_m[pix_a]
        on &= ~(z > (one + noise) * meas)
        nx_, ny_, nz_ = P[:, F.NX], P[:, F.NY], P[:, F.NZ]
        lsnx = T_lg[0, 0] * nx_ + T_lg[0, 1] * ny_ + T_lg[0, 2] * nz_
        lsny = T_lg[1, 0] * nx_ + T_lg[1, 1] * ny_ + T_lg[1, 2] * nz_
        lsnz = T_lg[2, 0] * nx_ + T_lg[2, 1] * ny_ + T_lg[2, 2] * nz_
        on &= (lx * lsnx + ly * lsny + z * lsnz) / \
            np.maximum(sdist, F32(1e-30)) <= 0
        on &= rad >= 0
        on &= radius_flat[pix_a] / np.where(rad != 0, rad, F32(1e-30)) \
            <= F32(1.5 ** 2)

        slot_idx = self.neighbors.copy()
        # fast_neighbor_update semantics: existing-slot distances come from
        # the STORED nbr_dist (no per-frame slot re-gather); detach-flagged
        # candidates are rejected instead of swept afterwards.
        slot_dist = np.where(slot_idx != INVALID, self.nbr_dist,
                             np.float32(np.inf))
        # The 4 adjacent-pixel supporting surfels of pixel a, in the fixed
        # direction order x-1, x+1, y-1, y+1.
        sup_map = supporting.reshape(h, w)
        for dx_, dy_ in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            cx_ = np.clip(px + dx_, 0, w - 1)
            cy_ = np.clip(py + dy_, 0, h - 1)
            inb = (px + dx_ >= 0) & (px + dx_ < w) & \
                (py + dy_ >= 0) & (py + dy_ < h)
            cand = np.where(inb, sup_map[cy_, cx_], INVALID).astype(np.int32)
            ok = on & (cand != INVALID) & (cand != idx)
            cc = np.clip(cand, 0, n - 1)
            cdx = P[cc, F.PX] - P[:, F.PX]
            cdy = P[cc, F.PY] - P[:, F.PY]
            cdz = P[cc, F.PZ] - P[:, F.PZ]
            c_dist = cdx * cdx + cdy * cdy + cdz * cdz
            ok &= c_dist <= reg_sq * rad
            ok &= nx_ * P[cc, F.NX] + ny_ * P[cc, F.NY] + \
                nz_ * P[cc, F.NZ] > 0
            ok &= P[cc, F.DETACH] <= 0
            ok &= ~(slot_idx == cand[:, None]).any(axis=1)
            best = np.argmax(slot_dist, axis=1)
            best_dist = slot_dist[np.arange(n), best]
            ok &= c_dist < best_dist
            rows = np.where(ok)[0]
            slot_idx[rows, best[rows]] = cand[rows]
            slot_dist[rows, best[rows]] = c_dist[rows]
        self.neighbors = slot_idx
        self.nbr_dist = np.where(slot_idx != INVALID, slot_dist,
                                 np.float32(np.inf))
        out["neighbors_after_update"] = self.neighbors.copy()

        # --- Phase 7: creation (kernels.cu:90-271) --------------------------
        interior = ((lin % w) >= 1) & ((lin // w) >= 1) & \
            ((lin % w) < w - 1) & ((lin // w) < h - 1)
        flags = interior & (depth.reshape(hw) > 0) & \
            (supporting == INVALID) & ~has_conflict
        c_budget = min(p.max_creations_per_frame, hw)
        src = np.where(flags)[0]
        created = 0
        base = self.count
        for j, pixi in enumerate(src):
            if j >= c_budget or base + j >= n:
                break
            created += 1
            d = base + j
            row = np.zeros(P.shape[1], F32)
            row[F.PX], row[F.PY], row[F.PZ] = pgx[pixi], pgy[pixi], pgz[pixi]
            row[F.NX], row[F.NY], row[F.NZ] = ngx[pixi], ngy[pixi], ngz[pixi]
            row[F.CONF] = 1.0
            row[F.RAD] = radius_flat[pixi]
            row[F.CR], row[F.CG], row[F.CB] = cr[pixi], cg[pixi], cb[pixi]
            fbits = np.int32(frame).view(F32)
            row[F.CREATION] = fbits
            row[F.STAMP] = fbits
            # neighbors from the 4 adjacent pixels + pre-smoothed position.
            nbr = np.full(4, INVALID, np.int32)
            ndist = np.full(4, np.inf, F32)
            esum = np.zeros(3, F32)
            ecnt = F32(1.0)
            pf = {int(q): k for k, q in enumerate(src[:c_budget])
                  if base + k < n}
            for k, sh in enumerate((-1, +1, -w, +w)):
                adj = int(pixi) + sh
                sup = supporting[adj]
                if sup != INVALID:
                    dd = P[sup, F.PX:F.PZ + 1] - \
                        np.array([pgx[pixi], pgy[pixi], pgz[pixi]], F32)
                    if F32(dd @ dd) <= reg_sq * radius_flat[pixi]:
                        nbr[k] = sup
                        ndist[k] = F32(dd @ dd)
                        esum += P[sup, F.SX:F.SZ + 1]
                        ecnt += 1
                elif adj in pf:
                    ad = depth_m[adj]
                    if (depth_m[pixi] - ad) ** 2 <= \
                            reg_sq * radius_flat[pixi]:
                        nbr[k] = base + pf[adj]
                        ndist[k] = (depth_m[pixi] - ad) ** 2
            row[F.SX:F.SZ + 1] = (np.array(
                [pgx[pixi], pgy[pixi], pgz[pixi]], F32) + esum) / ecnt
            P[d] = row
            self.neighbors[d] = nbr
            self.nbr_dist[d] = ndist
        self.count = base + created
        out["pack_after_create"] = self.pack.copy()
        out["neighbors_after_create"] = self.neighbors.copy()
        out["surfel_count_after_create"] = self.count

        # --- Phase 8: regularization (kernels.cu:2099-2308), symmetric -----
        for _ in range(p.regularization_iterations):
            self._regularize(frame, p)
        out["final_pack"] = self.pack.copy()
        out["final_neighbors"] = self.neighbors.copy()
        return out

    def _regularize(self, frame, p):
        F = self.F
        P = self.pack
        n = P.shape[0]
        w_reg = F32(p.regularizer_weight)
        window = p.regularization_frame_window_size
        reg_sq = F32(p.radius_factor_for_regularization_neighbors ** 2)
        nbr = self.neighbors
        nc = np.clip(nbr, 0, n - 1)
        valid = nbr != INVALID
        stamps = P[:, F.STAMP].view(np.int32)
        slot_recent = stamps[nc] >= frame - window
        use = valid & slot_recent
        cnt = use.sum(axis=1).astype(F32)
        sxyz = P[:, F.SX:F.SZ + 1]
        d = P[nc, F.SX:F.SZ + 1] - sxyz[:, None, :]
        nrm = P[:, F.NX:F.NZ + 1]
        ndot = (nrm[:, None, :] * d).sum(-1, dtype=F32)
        dist_sq = (d * d).sum(-1, dtype=F32)

        recent_self = stamps >= frame - window
        # Stored-count semantics (fusion.py _regularize): the cross-term
        # weight reads the RCNT column written by the PREVIOUS iteration /
        # frame (Jacobi lag), then this iteration's count is stored.
        cnt_i = P[nc, F.RCNT].copy()
        P[:, F.RCNT] = cnt
        factor_i = np.where(cnt_i > 0,
                            F32(2.0) * w_reg / np.maximum(cnt_i, F32(1.0)),
                            F32(0.0))
        wcnt_i = np.where(cnt_i > 0, w_reg / np.maximum(cnt_i, F32(1.0)),
                          F32(0.0))
        edge_on = valid & recent_self[:, None]
        in_dot = -(P[nc, F.NX:F.NZ + 1] * d).sum(-1, dtype=F32)
        contrib = np.where(edge_on, factor_i * in_dot, F32(0.0))
        grad = (contrib[..., None] * P[nc, F.NX:F.NZ + 1]).sum(
            1, dtype=F32)
        gcount = np.where(edge_on, wcnt_i, F32(0.0)).sum(1, dtype=F32)

        drop = use & (dist_sq > reg_sq * P[:, F.RAD][:, None])
        # fast_neighbor_update: merge tombstones (stamp == 0) release their
        # slots here, one phase after the reference's detach sweep.
        if frame > 0:
            drop |= valid & (stamps[nc] == 0)
        nbr = nbr.copy()
        nbr[drop] = INVALID
        self.neighbors = nbr

        valid2 = nbr != INVALID
        ndot2 = np.where(valid2, ndot, F32(0.0))
        cnt2 = valid2.sum(1).astype(F32)
        sum_ndot2 = ndot2.sum(1, dtype=F32)
        factor2 = np.where(cnt2 > 0,
                           F32(2.0) * w_reg / np.maximum(cnt2, F32(1.0)),
                           F32(0.0))
        reg = -sum_ndot2[:, None] * nrm
        recent = stamps >= frame - window
        g = F32(2.0) * (sxyz - P[:, F.PX:F.PZ + 1]) + grad \
            + factor2[:, None] * reg
        weight_sum = F32(1.0) + w_reg + gcount
        step = F32(0.5) / weight_sum
        with np.errstate(invalid="ignore"):
            max_step = np.sqrt(P[:, F.RAD])
            grad_len = step * np.sqrt((g * g).sum(1, dtype=F32))
            sf = np.where(grad_len > max_step,
                          max_step / np.maximum(grad_len, F32(1e-30)) * step,
                          step)
        upd = sxyz - sf[:, None] * g
        P[recent, F.SX:F.SZ + 1] = upd[recent]
        # Refresh stored slot distances from this pass's smoothed-position
        # reads (fast_neighbor_update semantics).
        self.nbr_dist = np.where(valid2, dist_sq, np.float32(np.inf))

    def _blend(self, depth, supporting, counts, sums, p):
        """Jacobi ring feathering (kernels.cu:563-738; Jacobi contract)."""
        h, w = depth.shape
        radius = max(p.measurement_blending_radius, 1)
        scale = F32(p.depth_scaling)
        supported = supporting != INVALID
        valid = depth != 0
        ys, xs = np.mgrid[0:h, 0:w]
        interior = (xs >= 1) & (ys >= 1) & (xs < w - 1) & (ys < h - 1)
        eligible = interior & valid & supported

        def sh(img, dy, dx, fill=0):
            out = np.full_like(img, fill)
            ys0, ys1 = max(0, -dy), min(h, h - dy)
            xs0, xs1 = max(0, -dx), min(w, w - dx)
            out[ys0:ys1, xs0:xs1] = img[ys0 + dy:ys1 + dy, xs0 + dx:xs1 + dx]
            return out

        meas_border = np.zeros((h, w), bool)
        surf_border = np.zeros((h, w), bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                nv = sh(valid, dy, dx, False)
                ns = sh(supported, dy, dx, False)
                meas_border |= ~nv
                surf_border |= nv & ~ns
        meas_border &= eligible
        surf_border &= eligible

        avg = sums.astype(F32) / np.maximum(counts, 1).astype(F32)
        depth_f = depth.astype(F32)
        delta0 = avg - depth_f / scale
        dist = np.where(meas_border, 1, np.where(eligible, 255, 0))
        deltas = np.where(meas_border, delta0, F32(0.0)).astype(F32)
        ndist = np.where(surf_border, 1, 0)
        ndeltas = np.where(surf_border, delta0, F32(0.0)).astype(F32)
        depth_f = np.where(meas_border, np.floor(scale * avg + F32(0.5)),
                           depth_f).astype(F32)
        unsupported_target = interior & valid & ~supported

        for it in range(2, radius):
            blend_w = scale * F32(1.0 - (it - 1.0) / (radius - 1.0))

            def ring_avg(dmap, dvals, it=it):
                ssum = np.zeros((h, w), F32)
                cnt = np.zeros((h, w), np.int32)
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        at = sh(dmap, dy, dx) == it - 1
                        ssum += np.where(at, sh(dvals, dy, dx), F32(0.0))
                        cnt += at
                return ssum, cnt

            ssum, cnt = ring_avg(dist, deltas)
            grow = (dist == 255) & (cnt > 0)
            avg_d = (ssum / np.maximum(cnt, 1).astype(F32)).astype(F32)
            dist = np.where(grow, it, dist)
            deltas = np.where(grow, avg_d, deltas).astype(F32)
            depth_f = np.where(grow, depth_f + blend_w * avg_d + F32(0.5),
                               depth_f).astype(F32)

            nsum, ncnt = ring_avg(ndist, ndeltas)
            ngrow = unsupported_target & (ndist == 0) & (ncnt > 0)
            navg = (nsum / np.maximum(ncnt, 1).astype(F32)).astype(F32)
            ndist = np.where(ngrow, it, ndist)
            ndeltas = np.where(ngrow, navg, ndeltas).astype(F32)
            depth_f = np.where(ngrow, depth_f + blend_w * navg + F32(0.5),
                               depth_f).astype(F32)
        return np.clip(np.floor(depth_f), 0, 65535).astype(np.uint16)
