"""Perfetto-profile the flagship forward and print the per-op device-time
breakdown (the workflow documented in CLAUDE.md).

    python scripts/profile_fwd.py [--batch 1] [--dtype bfloat16] [--iters 6]

Honest timing on the tunnelled TPU requires never-repeated input buffers and
a value fetch as the barrier (see bench.py); the perfetto trace is parsed
locally — no tensorboard needed.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--fast-pyramid", default="0",
                   help="0=exact, 1=tokenizer-only, int=stratified prefix")
    p.add_argument("--fast-graph", type=int, default=0,
                   help="1 = DGCNN cross-index reuse (needs fast-pyramid)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import FLAGSHIP_SEG_ARGS, _build

    seg = dict(FLAGSHIP_SEG_ARGS)
    seg["dtype"] = args.dtype
    if args.fast_pyramid == "1":
        seg["fast_pyramid"] = True
    elif args.fast_pyramid != "0":
        seg["fast_pyramid"] = int(args.fast_pyramid)
    if args.fast_graph:
        seg["fast_graph"] = True
    model, variables, _ = _build(seg, 16000, args.batch)
    fwd = jax.jit(lambda v, b: jnp.sum(model.apply(v, b)[0]))
    rng = np.random.default_rng(0)

    def fresh():
        pos = jnp.asarray(rng.standard_normal(
            (args.batch, 16000, 3)).astype(np.float32))
        return {"pos": pos, "x": pos,
                "cls": jnp.zeros((args.batch, 1), jnp.int32)}

    batches = [fresh() for _ in range(args.iters + 2)]
    float(fwd(variables, batches[0]))
    float(fwd(variables, batches[1]))

    tdir = tempfile.mkdtemp(prefix="geot_trace_")
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    outs = [fwd(variables, b) for b in batches[2:]]
    float(outs[-1])
    jax.profiler.stop_trace()

    fn = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)[0]
    ev = json.load(gzip.open(fn))["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "") for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p_ for p_, n in pid_names.items() if "TPU" in n]
    agg = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0)
    print(f"trace: {fn}")
    for k, v in sorted(agg.items(), key=lambda x: -x[1])[:args.top]:
        print(f"  {v / 1e3 / args.iters:8.3f} ms/iter  {k}")


if __name__ == "__main__":
    main()
