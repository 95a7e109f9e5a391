"""bench.py overwrite guard (judge ask r8→r9 #7): smoke scales write
BENCH_SMOKE.json, and at sf0.1 a BENCH_LOCAL.json byte-matching the
committed sitting is not silently clobbered — the recurring working-tree
trap of rounds 6–8."""

from __future__ import annotations

import subprocess

import bench


def _git(tmp, *args):
    subprocess.run(
        ["git", "-C", str(tmp), *args],
        check=True,
        capture_output=True,
        env={
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
            "HOME": str(tmp),
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        },
    )


def test_smoke_scale_never_targets_bench_local(tmp_path):
    assert bench._payload_target(str(tmp_path), 0.001, False) == "BENCH_SMOKE.json"
    assert bench._payload_target(str(tmp_path), 0.01, False) == "BENCH_SMOKE.json"
    # even --force keeps smoke payloads out of the sitting file
    assert bench._payload_target(str(tmp_path), 0.001, True) == "BENCH_SMOKE.json"


def test_committed_sitting_is_guarded_until_forced(tmp_path):
    _git(tmp_path, "init", "-q")
    local = tmp_path / "BENCH_LOCAL.json"
    local.write_text('{"value": 1}\n')
    _git(tmp_path, "add", "BENCH_LOCAL.json")
    _git(tmp_path, "commit", "-q", "-m", "sitting")
    # clean tree: the committed sitting is protected
    assert bench._payload_target(str(tmp_path), 0.1, False) == "BENCH_SMOKE.json"
    # --force replaces it deliberately
    assert bench._payload_target(str(tmp_path), 0.1, True) == "BENCH_LOCAL.json"
    # a locally-dirty BENCH_LOCAL (mid-iteration) keeps being overwritten
    local.write_text('{"value": 2}\n')
    assert bench._payload_target(str(tmp_path), 0.1, False) == "BENCH_LOCAL.json"
    # a missing local file is also fine to (re)create
    local.unlink()
    assert bench._payload_target(str(tmp_path), 0.1, False) == "BENCH_LOCAL.json"


def test_no_git_repo_falls_back_to_overwrite(tmp_path):
    (tmp_path / "BENCH_LOCAL.json").write_text("{}\n")
    assert bench._payload_target(str(tmp_path), 0.1, False) == "BENCH_LOCAL.json"
