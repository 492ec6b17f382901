"""The examples/ walkthroughs must stay runnable — they are the user
journey (train → checkpoint → resume → eval; train → freeze → serve)."""

import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")
sys.path.insert(0, os.path.abspath(EXAMPLES))


def test_train_dlrm_example_tiny(tmp_path):
    import train_dlrm

    res = train_dlrm.main(["--tiny", "--ckpt-dir", str(tmp_path)])
    assert res["last_loss"] < res["first_loss"]
    assert res["auc"] > 0.8, res
    assert os.path.exists(res["ckpt"])


@pytest.mark.parametrize("quantize", [False, True])
def test_serve_embedding_example_tiny(quantize):
    import serve_embedding

    argv = ["--tiny", "--train-steps", "20"]
    if quantize:
        argv.append("--quantize")
    res = serve_embedding.main(argv)
    assert res["served"] == 126
    assert res["max_rel_err"] < (0.06 if quantize else 5e-3)
