"""Multi-host launcher: run the sharded stereo pipeline across N processes.

The reference is strictly single-process (SURVEY.md §5.8); this is the
TPU-native multi-host path: every process joins via
jax.distributed.initialize (parallel.mesh.init_distributed), builds the
global ('stream', 'tile') mesh (hosts on 'stream', local devices on
'tile'), and steps ShardedStereoPipeline.run_multihost on its local frame
shard.  Collectives ride DCN/ICI on a pod; on the CPU test mesh used here
they ride Gloo over localhost.

Parent mode (default): spawns --nproc workers on this machine with
--local-devices forced host devices each, waits, and reports
  steps/s per process, per-shard validation, weak-scaling JSON.
Worker mode (--worker N): joins the job and runs the benchmark.

Usage:
  python scripts/multihost_launch.py --nproc 2 --local-devices 4 --steps 4
  python scripts/multihost_launch.py --nproc 1 ...   # scaling baseline
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--worker", type=int, default=-1)
    ap.add_argument("--port", type=int, default=12731)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--frames-per-host", type=int, default=2)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--disp-max", type=int, default=63)
    ap.add_argument("--no-validate", action="store_true",
                    help="skip the per-shard single-device validation "
                         "(hours at KITTI size on CPU; correctness is "
                         "covered at small shapes by tests/test_multihost)")
    ap.add_argument("--use-pallas", action="store_true",
                    help="Pallas kernels per shard (interpret mode on CPU "
                         "— slow; correctness only)")
    ap.add_argument("--pin", action="store_true",
                    help="taskset-pin each worker to one core so weak "
                         "scaling is not polluted by XLA's intra-op "
                         "threadpool grabbing every core in the 1-proc "
                         "baseline")
    ap.add_argument("--out", type=str, default="")
    return ap


def worker(args) -> dict:
    import numpy as np
    import jax

    sys.path.insert(0, ROOT)
    from stereovision_tpu.params import robotics_params
    from stereovision_tpu.parallel.mesh import init_distributed, multihost_mesh
    from stereovision_tpu.parallel.shard import ShardedStereoPipeline
    from stereovision_tpu.models.elas import ElasEngine

    init_distributed(f"127.0.0.1:{args.port}", args.nproc, args.worker)
    pid = jax.process_index()
    mesh = multihost_mesh()          # hosts on 'stream', local on 'tile'
    print(f"[proc {pid}] mesh={dict(mesh.shape)} "
          f"devices={jax.device_count()}", flush=True)

    w, h = args.width, args.height
    p = robotics_params(disp_max=args.disp_max,
                        postprocess_only_left=False)
    pipe = ShardedStereoPipeline(p, w, h, mesh, use_pallas=args.use_pallas)

    # deterministic global scene; every process slices out its own frames
    B_loc = args.frames_per_host
    B = B_loc * mesh.shape["stream"]
    rng = np.random.default_rng(42)
    L = rng.integers(0, 255, (B, h, w), dtype=np.uint8)
    R = np.stack([np.roll(L[i], -(5 + i), axis=1) for i in range(B)])
    lo = pid * B_loc
    L_loc, R_loc = L[lo:lo + B_loc], R[lo:lo + B_loc]

    # warmup/compile
    D1, D2 = pipe.run_multihost(L_loc, R_loc)
    jax.block_until_ready(D1)

    # validate this process's shards against a single-device engine
    # (errs=None means validation was skipped — distinct from "0 errors")
    errs = None
    if not args.no_validate:
        errs = 0
        single = ElasEngine(p, w, h, use_pallas=args.use_pallas)
        for s in D1.addressable_shards:
            bi = s.index[0].start or 0
            rows = s.index[1]
            ref = np.asarray(single.process(L[bi], R[bi])[0])
            if pipe.pad_out:    # padded row sharding (parallel/shard.py)
                ref = np.pad(ref, ((0, pipe.pad_out), (0, 0)),
                             constant_values=-10)
            ref = ref[rows]
            if not np.array_equal(np.asarray(s.data)[0], ref):
                errs += 1
        print(f"[proc {pid}] shard validation: "
              f"{'OK' if errs == 0 else f'{errs} shards differ'}", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        D1, D2 = pipe.run_multihost(L_loc, R_loc)
        jax.block_until_ready(D1)
    dt = time.perf_counter() - t0
    fps = args.steps * B / dt
    res = {"process": pid, "mesh": dict(mesh.shape), "steps": args.steps,
           "global_batch": B, "frames_per_s": round(fps, 3),
           "step_s": round(dt / args.steps, 4),
           "shard_errors": "skipped" if errs is None else errs}
    print(f"[proc {pid}] RESULT {json.dumps(res)}", flush=True)
    return res


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.worker >= 0:
        res = worker(args)
        return 0 if res["shard_errors"] in (0, "skipped") else 1

    env_base = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS",)}
    procs = []
    for i in range(args.nproc):
        env = dict(env_base)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{args.local_devices}").strip()
        env["JAX_PLATFORM_NAME"] = "cpu"
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(i)]
        if args.pin:
            cmd = ["taskset", "-c", str(i % os.cpu_count())] + cmd
        for f in ("nproc", "local_devices", "port", "steps",
                  "frames_per_host", "width", "height", "disp_max"):
            cmd += ["--" + f.replace("_", "-"), str(getattr(args, f))]
        if args.use_pallas:
            cmd.append("--use-pallas")
        if args.no_validate:
            cmd.append("--no-validate")
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate()[0] for p in procs]
    rc = max(p.returncode for p in procs)
    results = []
    for o in outs:
        sys.stdout.write(o)
        for line in o.splitlines():
            if "RESULT" in line:
                results.append(json.loads(line.split("RESULT ", 1)[1]))
    if args.out and results:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    if rc == 0 and len(results) == args.nproc:
        print(f"multihost OK: {args.nproc} processes, "
              f"{results[0]['frames_per_s']} frames/s global")
        return 0
    print("multihost FAILED", file=sys.stderr)
    return rc or 1


if __name__ == "__main__":
    sys.exit(main())
