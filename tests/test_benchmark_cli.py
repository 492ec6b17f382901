"""Smoke tests for the benchmark CLI and profiling utilities."""

import subprocess
import sys

import numpy as np

from fbtt_embedding_tpu.benchmark import generate_requests, validate_list
from fbtt_embedding_tpu.utils import profiling


def test_validate_list():
    assert validate_list("200,220,250") == [200, 220, 250]
    try:
        validate_list("0,2")
        assert False
    except ValueError:
        pass


def test_generate_requests_reuse():
    rng = np.random.default_rng(0)
    reqs = generate_requests(rng, 3, 8, 2, 4, 1000, reuse=0.5)
    assert len(reqs) == 3
    idx0, offs, w = reqs[0]
    assert idx0.shape == (2 * 8 * 4,)
    assert offs[-1] == idx0.size and w is None
    # ~half the indices carry over between consecutive batches
    same = (reqs[0][0] == reqs[1][0]).mean()
    assert same >= 0.4


def test_generate_requests_zipf_weighted():
    rng = np.random.default_rng(0)
    (idx, offs, w), = generate_requests(rng, 1, 16, 1, 8, 10_000,
                                        alpha=1.5, weighted=True)
    assert w is not None and w.shape == idx.shape
    _, counts = np.unique(idx, return_counts=True)
    assert counts.max() > 2  # skew

def test_cli_end_to_end():
    """Run the CLI on a tiny config (CPU, xla impl).

    Deliberately slim (no ``--run-baseline``, tiny shapes, 4 iters) — the
    heavier variant timed out under machine load and a flaky smoke test
    trains people to ignore red; the baseline path is covered on-device by
    ``bench.py``.
    """
    cmd = [
        sys.executable, "-m", "fbtt_embedding_tpu.benchmark",
        "--batch-size", "16", "--pooling-factor", "2", "--iters", "4",
        "--p-shapes", "8,9,10", "--q-shapes", "4,2,2", "--ranks", "8,8",
        "--impl", "xla", "--no-cache",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TTEmbeddingBag FWD-BWD time/nnz" in out.stderr


def test_profiling_models():
    f = profiling.tt_flops([4, 4, 4], [32, 32], 10240)
    # reference model: (q0*r1*q1*r2 + q0*q1*r2*q2) * 2 * nnz * 3
    assert f == (4 * 32 * 4 * 32 + 4 * 4 * 32 * 4) * 2.0 * 10240 * 3.0
    sol = profiling.speed_of_light(
        [200, 220, 250], [4, 4, 4], [32, 32], 10240, 512,
        device_kind="TPU v5 lite")
    assert sol["bound"] in ("compute", "memory")
    assert sol["t_sol_s"] > 0


def test_generate_requests_long_index_dtype():
    # Reference --long-index default: int64 indices/offsets
    # (tt_embeddings_benchmark.py:96-98,130).
    import numpy as np
    rng = np.random.default_rng(0)
    (idx, offs, _), = generate_requests(rng, 1, 8, 1, 4, 1000)
    assert idx.dtype == np.int64 and offs.dtype == np.int64
    (idx32, offs32, _), = generate_requests(
        rng, 1, 8, 1, 4, 1000, long_index=False)
    assert idx32.dtype == np.int32 and offs32.dtype == np.int32
