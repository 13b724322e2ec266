"""Real multi-host execution: two OS processes join via
jax.distributed.initialize (Gloo on localhost), build a global
('stream', 'tile') mesh, and step the sharded pipeline on per-process
frame shards with per-shard validation against the single-device engine.

The reference is strictly single-process (SURVEY.md §5.8); this covers the
TPU-native multi-host layer end-to-end: launcher, init_distributed,
multihost_mesh, run_multihost, and the cross-process stage boundaries."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_pallas_midsize(tmp_path):
    """Production-kernel (Pallas, interpret on CPU) sharded config at a
    mid-size shape — 512x192, the largest shape the dryrun runs the
    Pallas path at — across two real processes with per-shard bit-exact
    validation (VERDICT r4 next #7: the sharded Pallas dispatch was only
    evidenced at 96x160 before)."""
    out = tmp_path / "mh_pl.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "multihost_launch.py"),
         "--nproc", "2", "--local-devices", "2", "--steps", "1",
         "--frames-per-host", "1", "--width", "512", "--height", "192",
         "--use-pallas", "--port", "12769", "--out", str(out)],
        cwd=ROOT, capture_output=True, text=True, timeout=1500, env=env)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    res = json.loads(out.read_text())
    assert len(res) == 2
    for x in res:
        assert x["shard_errors"] == 0
        assert x["mesh"] == {"stream": 2, "tile": 2}


def test_two_process_launcher(tmp_path):
    out = tmp_path / "mh.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # height 95 does NOT divide the 2-way tile axis: exercises the padded
    # row sharding (parallel/shard.py) with per-shard validation
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "multihost_launch.py"),
         "--nproc", "2", "--local-devices", "2", "--steps", "2",
         "--frames-per-host", "2", "--height", "95",
         "--port", "12759", "--out", str(out)],
        cwd=ROOT, capture_output=True, text=True, timeout=580, env=env)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    res = json.loads(out.read_text())
    assert len(res) == 2
    assert {x["process"] for x in res} == {0, 1}
    for x in res:
        assert x["shard_errors"] == 0
        assert x["mesh"] == {"stream": 2, "tile": 2}
        assert x["global_batch"] == 4
