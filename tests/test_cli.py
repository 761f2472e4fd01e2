"""Console entry (`python -m linkkchecker_net_spark`) — Program.cs parity:
config validation errors print and exit 2 (EngineConfig.EnsureCorrect,
Program.cs:17-25); exit code = failure count (Program.cs:42)."""

import sys

from linkkchecker_net_spark.__main__ import main


def test_bad_seed_rejected(capsys):
    rc = main(["ht tp://bad url", "--web", "/nonexistent"])
    assert rc == 2
    assert "Uri is incorrect" in capsys.readouterr().out


def test_resume_requires_ckpt(capsys):
    rc = main(["http://a.test/", "--resume", "--web", "/nonexistent"])
    assert rc == 2
    assert "--resume requires --ckpt" in capsys.readouterr().out
