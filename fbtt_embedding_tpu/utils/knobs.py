"""Central registry for the ``FBTT_*`` performance / config knobs.

SURVEY §5 asks for a config surface; the A/B knobs accumulated across the
measurement labs (``scripts/*_lab.py``) live here in ONE documented place.
Every knob is an environment variable read at **trace time** (each jit
specialization bakes the value in — change a knob, then force a retrace
or a new process to see the effect), except the two marked *import-time*
which bind when ``ops.pallas.tt_flat`` first imports.

These are A/B instruments, not tuning requirements: every knob's default
is the measured-best adaptive policy and the expected production setting
is "unset". The measurement story behind each default is in
``docs/PERF.md`` and the lab scripts.

Registry (name → meaning, default, interactions):

``FBTT_SEG`` (int; *import-time* for the module constant, per-call for
    the adaptive policy)
    Lookups per flat-pipeline grid segment. Unset: adaptive ``_seg_for``
    (128 below 64k nnz, 512 at/above — round-5 within-epoch sweeps).
    Setting it PINS every call site and silently disables the adaptive
    policy.
``FBTT_SPAN_BLOCK`` (int, default 4; *import-time*)
    Upper cap on spans per kernel loop trip; also sizes the span-table
    tail and accumulator padding, so it must be constant per process.
    ``FBTT_TRIP_SB`` is clamped to it.
``FBTT_SPP`` (int, default 1)
    Segments per kernel PROGRAM (grid batching): divides the grid's
    program count without growing the per-span masked work (unlike
    raising ``FBTT_SEG``). Measured NEUTRAL on v5e (the grid pipeline
    already hides the per-program envelope) — kept as the A/B record.
``FBTT_TRIP_SB`` (int)
    Pins the per-pass trip width. Unset: adaptive ``_sb_for`` from
    spans-per-segment density. Clamped to ``FBTT_SPAN_BLOCK``.
``FBTT_TRIP`` ("concat" | "dots", default "concat")
    Trip-block contraction strategy: one wide lane-concat MXU dot vs
    ``sb`` small static-sliced dots.
``FBTT_PAIR`` ("0" | "1")
    First-pass G0×G1 pair-product fusion. Unset: auto (structural gates
    AND nnz >= 16384 — the measured build-amortization crossover).
    Overrides the nnz heuristic only, never the structural gates.
``FBTT_FUSED_APPLY`` ("0" | "1", default "auto")
    Fused flat train-apply (shared fwd/bwd plan + 3-output last-core
    kernel). Auto: fused below nnz=32768, split above (measured
    crossover).
``FBTT_DG0`` ("fused" | "onehot", default "onehot")
    dG0 accumulation strategy. "fused" measured slower at every batch
    size on v5e; kept as the measurement record.
``FBTT_HOT_SCATTER`` ("0" | anything else, default "auto"=on)
    LFU-window hot scatter for cache-row updates. "0" forces the plain
    XLA scatter for A/B.
``FBTT_ACC_T`` ("0" | "1", default "auto")
    Transposed gradient accumulators. Auto: transpose when the output
    block is narrower than the input block (wider axis on lanes).
``FBTT_PACK_PERM`` ("1" to enable, default off)
    uint32-packed bf16 gather for sort-order permutes. Wins isolated,
    loses in-graph (tile-padded reshape) — off by default.

Multi-host process-env config (``parallel/multihost.py`` — not perf
knobs): ``FBTT_COORDINATOR``, ``FBTT_NUM_PROCESSES``,
``FBTT_PROCESS_ID``.
"""

from __future__ import annotations

import os
from typing import Optional

# knob name -> (kind, default-as-documented) — the source of truth for
# tests and for `python -m fbtt_embedding_tpu.utils.knobs`
PERF_KNOBS = {
    "FBTT_SEG": ("int", "adaptive (_seg_for: 128 | 512)"),
    "FBTT_SPAN_BLOCK": ("int", "4 (import-time)"),
    "FBTT_SPP": ("int", "1 (measured neutral)"),
    "FBTT_TRIP_SB": ("int", "adaptive (_sb_for)"),
    "FBTT_TRIP": ("str", "concat"),
    "FBTT_PAIR": ("bool01", "auto (nnz >= 16384)"),
    "FBTT_FUSED_APPLY": ("bool01", "auto (nnz <= 32768)"),
    "FBTT_DG0": ("str", "onehot"),
    "FBTT_HOT_SCATTER": ("bool01", "on"),
    "FBTT_ACC_T": ("bool01", "auto (wider axis on lanes)"),
    "FBTT_PACK_PERM": ("bool01", "off"),
}

CONFIG_ENV = ("FBTT_COORDINATOR", "FBTT_NUM_PROCESSES", "FBTT_PROCESS_ID")


def get_str(name: str, default: Optional[str] = None) -> Optional[str]:
    """Raw knob value (None/default when unset). ``name`` must be
    registered — unknown knobs are a programming error, which is the
    point of having a registry."""
    assert name in PERF_KNOBS or name in CONFIG_ENV, name
    return os.environ.get(name, default)


def get_int(name: str) -> Optional[int]:
    """Integer knob, or None when unset (caller applies its adaptive
    default)."""
    v = get_str(name)
    return int(v) if v else None


def describe() -> str:
    """Current settings table (for logs / `python -m ...knobs`)."""
    lines = ["FBTT_* knob settings (unset = adaptive default):"]
    for name, (_, default) in PERF_KNOBS.items():
        v = os.environ.get(name)
        lines.append(f"  {name:<18} = {v if v is not None else '<unset>':<10}"
                     f" (default: {default})")
    return "\n".join(lines)


if __name__ == "__main__":
    print(describe())
