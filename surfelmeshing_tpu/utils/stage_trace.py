"""Trace-extracted per-stage fusion timings.

The reference brackets each fusion phase with cudaEvents and logs real
per-phase device ms (cuda_surfel_reconstruction.cc:112-320, log format
main.cc:1531-1545).  One XLA program cannot be event-bracketed — and the
previous cumulative-prefix wall-clock differencing was unsound (a prefix
program can compile FASTER than a shorter one via DCE, yielding persistent
zero columns).  The honest XLA equivalent is profiler-trace extraction:

1. the fusion body tags each phase with jax.named_scope("sm_<column>")
   (ops/fusion.py `_StageScopes`), which lands in HLO metadata op_name;
2. one probe step runs under jax.profiler.trace;
3. the xplane device events are attributed to columns via the `tf_op` stat
   (TPU device planes carry the scoped op path) or, on backends whose
   events carry only HLO instruction names (XLA:CPU thunks), via an
   instruction-name -> column map parsed from the EXACT executable's
   optimized HLO text.

Attribution is per fused op (a fusion spanning two scopes reports under its
root's scope) — the same granularity any profiler has on fused code.
"""

from __future__ import annotations

import collections
import glob
import re
from typing import Dict, Optional

COLUMNS = ("data_association", "surfel_merging", "measurement_blending",
           "integration", "neighbor_update", "new_surfel_creation",
           "regularization")

_SCOPE_RE = re.compile(
    r"sm_(data_association|surfel_merging|measurement_blending|integration"
    r"|neighbor_update|new_surfel_creation|regularization)")
_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = .*op_name=\"([^\"]*)\"")


def column_of(op_path: Optional[str]) -> Optional[str]:
    m = _SCOPE_RE.search(op_path or "")
    return m.group(1) if m else None


def build_instr_map(hlo_text: str) -> Dict[str, str]:
    """Instruction name -> column, from optimized-HLO metadata op_name."""
    imap: Dict[str, str] = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if m:
            col = column_of(m.group(2))
            if col:
                imap[m.group(1)] = col
    return imap


def extract_stage_ms(trace_dir: str,
                     instr_map: Optional[Dict[str, str]] = None
                     ) -> Dict[str, float]:
    """Aggregate xplane device-op durations into per-column ms.

    Device planes (TPU): 'XLA Ops' events attributed via the tf_op stat.
    Host XLA planes (XLA:CPU thunk lines 'tf_XLA*'): events carry bare
    instruction names; attributed through `instr_map`.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        return {c: 0.0 for c in COLUMNS}
    space = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        space.ParseFromString(f.read())

    totals: collections.Counter = collections.Counter()
    for plane in space.planes:
        is_device = plane.name.startswith("/device:")
        has_xla_lines = any(ln.name.startswith("tf_XLA")
                            for ln in plane.lines)
        if not (is_device or has_xla_lines):
            continue
        meta = {m_id: m for m_id, m in plane.event_metadata.items()}
        stat_meta = {m_id: m.name for m_id, m in plane.stat_metadata.items()}
        for line in plane.lines:
            if is_device:
                if line.name != "XLA Ops":
                    continue
            elif not line.name.startswith("tf_XLA"):
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else ""
                if name.startswith("end:"):
                    continue
                col = None
                for st in list(ev.stats) + (list(m.stats) if m else []):
                    if stat_meta.get(st.metadata_id) == "tf_op":
                        col = column_of(st.str_value or st.ref_value)
                        if col:
                            break
                if col is None and instr_map is not None:
                    # Device event names can be full instruction text
                    # ('%fusion.2 = f32[...] ...'); host thunk events are
                    # the bare instruction name.
                    instr = name.split(" = ")[0].lstrip("%").strip()
                    col = instr_map.get(instr)
                if col is not None:
                    totals[col] += ev.duration_ps
    return {c: totals.get(c, 0) / 1e9 for c in COLUMNS}


class StagedFusionTimer:
    """Per-frame trace-extracted stage timings for the fusion step.

    Compiles the (non-donating) probe program once per shape/params key,
    keeps its instruction->column map, and on measure() runs one step under
    jax.profiler.trace, returning {column: device_ms}.
    """

    def __init__(self):
        self._cache = {}

    def _get(self, params, state, args, n_eff):
        import jax

        key = (params, n_eff, state.pack.shape,
               tuple(a.shape + (str(a.dtype),) for a in args))
        hit = self._cache.get(key)
        if hit is None:
            from ..ops.fusion import (_integrate_bucketed_impl,
                                      integrate_frame_probe)
            if n_eff is not None:
                import functools
                probe = jax.jit(functools.partial(
                    _integrate_bucketed_impl, params=params, n_eff=n_eff))
                lowered = probe.lower(state, *args)
            else:
                lowered = integrate_frame_probe.lower(state, *args, params)
            compiled = lowered.compile()
            imap = build_instr_map(compiled.as_text())
            hit = (compiled, imap)
            self._cache[key] = hit
        return hit

    def measure(self, params, state, args, n_eff=None) -> Dict[str, float]:
        import shutil
        import tempfile

        import jax

        compiled, imap = self._get(params, state, args, n_eff)
        tmp = tempfile.mkdtemp(prefix="smtrace_")
        try:
            with jax.profiler.trace(tmp):
                out = compiled(state, *args)
                jax.block_until_ready(out)
            del out
            return extract_stage_ms(tmp, imap)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
