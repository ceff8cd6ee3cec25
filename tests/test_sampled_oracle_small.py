"""The hash-sampled scale-verification tool itself, exercised end to
end at tiny scale (2 copies, rate 4) so the 100×/SCALE.md evidence
rests on a tested harness: one per-doc section, one per-source
section, two of the round-8 group-closure sections, and the
doc+bounded-global-bench section (lexical_decontam)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sampled_oracle_tool_end_to_end(tmp_path):
    dst = str(tmp_path / "replica")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "sampled_oracle.py"),
            "--copies", "2", "--rate", "4", "--dst", dst,
            "--src", os.environ.get(
                "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
            ),
            "--keys", "char_profile,score_calibration,"
                      "url_dedup,containment,lexical_decontam",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    ok = [line for line in out.stdout.splitlines() if " OK " in line]
    assert len(ok) == 5, out.stdout
    assert "5/5 green" in out.stderr, out.stderr
