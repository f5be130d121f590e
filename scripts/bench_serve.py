"""Serving throughput: concurrent dialogues through TheaterServer.

Measures turns/min for S concurrent sessions advancing T turns each —
wave batching (one denoise program per turn-wave) vs serial submission —
on the real chip (default config) or the CPU tiny config (--tiny).
The reference has no serving layer at all (offline CLI only,
``generate.py:180-269``); this quantifies what the batching server adds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from theatergen_tpu.utils.fastinit import setup_compile_cache

setup_compile_cache()

import jax


SPECS = [
    {"prompt": "a knight in a forest",
     "gen_boxes": [("a red knight", (50, 100, 150, 300))],
     "bg_prompt": "a forest clearing", "extra_neg_prompt": "",
     "obj_ids": [0], "canvas_height": 512, "canvas_width": 512},
    {"prompt": "the knight rides toward a castle",
     "gen_boxes": [("a red knight", (200, 120, 160, 320))],
     "bg_prompt": "a castle road", "extra_neg_prompt": "",
     "obj_ids": [0], "canvas_height": 512, "canvas_width": 512},
]


def run_load(server, sessions: int, turns: int, tag: str = "",
             arrival_rate: float = 0.0, seed: int = 0):
    """Drive S sessions × T turns.  ``arrival_rate`` 0 = closed loop
    (each session submits its next turn the moment the previous resolves
    — the server interleaves sessions into waves); > 0 = open loop with
    per-session Poisson think time (Exp(rate) seconds between a turn's
    completion and the next arrival), the serving-SLO model.  Returns
    (wall seconds, per-turn submit→done latencies)."""
    import random

    rnd = random.Random(seed)
    for s in range(sessions):
        server.open_session(f"s{tag}{s}")

    def think() -> float:
        return rnd.expovariate(arrival_rate) if arrival_rate > 0 else 0.0

    t0 = time.time()
    # next_at: when a session's next turn arrives; in-flight futures
    next_at = {s: t0 + (think() if arrival_rate > 0 else 0.0)
               for s in range(sessions)}
    futures, submitted_at = {}, {}
    done_turns = {s: 0 for s in range(sessions)}
    latencies = []
    while len(latencies) < sessions * turns:
        now = time.time()
        for s, at in list(next_at.items()):
            if now >= at:
                futures[s] = server.submit(
                    f"s{tag}{s}", SPECS[done_turns[s] % len(SPECS)])
                submitted_at[s] = now
                del next_at[s]
        for s, f in list(futures.items()):
            if not f.done():
                continue
            f.result()          # raise on failure
            latencies.append(time.time() - submitted_at[s])
            done_turns[s] += 1
            del futures[s]
            if done_turns[s] < turns:
                next_at[s] = time.time() + think()
        time.sleep(0.005)
    return time.time() - t0, latencies


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--turns", type=int, default=2)
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--max_wave", type=int, default=8)
    ap.add_argument("--arrival_rate", type=float, default=0.0,
                    help="per-session Poisson arrival rate (turns/s after"
                         " each completion); 0 = closed-loop pipelining")
    ap.add_argument("--scheduler", default=None, choices=["ddim", "lcm"],
                    help="override the sampler (lcm: pair with"
                         " --num_steps 4)")
    ap.add_argument("--modes", default="wave,serial",
                    help="comma list of modes to run (wave, serial); lets"
                         " a chip session rerun one control without"
                         " repaying the other mode's warm+timed cost")
    args = ap.parse_args()
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    assert all(m in ("wave", "serial") for m in modes), modes

    import dataclasses

    from theatergen_tpu.config import sd15_config, tiny_config
    from theatergen_tpu.serve import TheaterServer

    cfg = tiny_config() if args.tiny else sd15_config()
    if args.scheduler:
        cfg = dataclasses.replace(
            cfg, pipeline=dataclasses.replace(
                cfg.pipeline, scheduler_type=args.scheduler))
    print("materializing params...", flush=True)
    if args.tiny:
        from theatergen_tpu.pipelines.bundle import init_bundle

        bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                             with_controlnet=True, with_vision=True)
    else:
        from theatergen_tpu.utils.fastinit import fast_bundle

        bundle = fast_bundle(cfg)

    import numpy as np

    results = {}
    for mode, window in [("wave", 0.25), ("serial", 0.0)]:
        if mode not in modes:
            continue
        with tempfile.TemporaryDirectory() as db:
            srv = TheaterServer(bundle, db, num_steps=args.num_steps,
                                max_wave=args.max_wave if mode == "wave"
                                else 1,
                                batch_window_s=window)
            try:
                # warm every wave width Poisson arrivals can form — each
                # distinct batch size is a separate compiled program, and
                # a width the warm pass misses would bill its compile to
                # a timed request's latency (seen: p50 26s vs 0.8s on the
                # CPU smoke because the singleton path compiled mid-run).
                # Serial mode only ever runs the width-1 program: warm
                # width 1 for 2 turns (covers the DB-hit second-turn
                # variant) instead of paying 1..S widths of warm turns.
                warm_widths = (range(1, args.sessions + 1)
                               if mode == "wave" else (1,))
                for w in warm_widths:
                    run_load(srv, w, 2 if mode == "serial" else 1,
                             tag=f"warm{w}_")
                waves0 = srv.stats()["waves"]
                dt, lats = run_load(srv, args.sessions, args.turns,
                                    arrival_rate=args.arrival_rate)
                stats = srv.stats()
                stats["waves"] -= waves0
            finally:
                srv.close()
        total = args.sessions * args.turns
        results[mode] = dict(seconds=round(dt, 2),
                             turns_per_min=round(60 * total / dt, 2),
                             p50_s=round(float(np.percentile(lats, 50)), 3),
                             p95_s=round(float(np.percentile(lats, 95)), 3),
                             waves=stats["waves"])
        print(f"{mode}: {total} turns in {dt:.1f}s "
              f"({results[mode]['turns_per_min']} turns/min, "
              f"p50 {results[mode]['p50_s']}s p95 {results[mode]['p95_s']}s,"
              f" {stats['waves']} waves)", flush=True)

    out = {
        "metric": f"serving throughput, {args.sessions} sessions x "
                  f"{args.turns} turns"
                  + (f", Poisson rate {args.arrival_rate}/s"
                     if args.arrival_rate else "")
                  + (f", {args.scheduler}" if args.scheduler else ""),
        **{m: results[m] for m in results},
    }
    if "wave" in results and "serial" in results:
        out["speedup"] = round(results["serial"]["seconds"]
                               / max(results["wave"]["seconds"], 1e-9), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
