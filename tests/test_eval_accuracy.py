"""CI-style accuracy regression gate on the full pixel pipeline.

Runs the committed eval recipe (eval.py: render synthetic Lafida-layout
images -> CLI -> in-repo ATE) on a reduced sequence and asserts the ATE
stays under the regression threshold. The committed full-length number
lives in EVAL.md."""
import json
import os

import pytest


@pytest.mark.slow
def test_synthetic_lafida_ate_regression(tmp_path, capsys):
    import eval as eval_mod

    rc = eval_mod.main(["--frames", "25", "--out", str(tmp_path / "ds")])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["frames_tracked"] >= 15, r
    # regression gate: full pixel pipeline (FAST -> ORB -> tracking -> BA)
    # on the noise-free rendered sequence. Round-2 scored 0.27 m here;
    # round 3 scores ~0.10 m on the 35-frame run — gate at 0.2 m so real
    # regressions trip while pipeline noise does not.
    assert r["value"] < 0.2, r
