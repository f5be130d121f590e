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


def run_load(server, sessions: int, turns: int, tag: str = "") -> float:
    """Drive S sessions × T turns with per-session pipelining (each
    session submits its next turn as soon as the previous resolves —
    the server interleaves sessions into waves).  Returns seconds."""
    for s in range(sessions):
        server.open_session(f"s{tag}{s}")
    t0 = time.time()
    futures = {s: server.submit(f"s{tag}{s}", SPECS[0])
               for s in range(sessions)}
    done_turns = {s: 0 for s in range(sessions)}
    while futures:
        for s, f in list(futures.items()):
            if not f.done():
                continue
            f.result()          # raise on failure
            done_turns[s] += 1
            del futures[s]
            if done_turns[s] < turns:
                futures[s] = server.submit(
                    f"s{tag}{s}", SPECS[done_turns[s] % len(SPECS)])
        time.sleep(0.005)
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--turns", type=int, default=2)
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--max_wave", type=int, default=8)
    args = ap.parse_args()

    from theatergen_tpu.config import sd15_config, tiny_config
    from theatergen_tpu.serve import TheaterServer

    cfg = tiny_config() if args.tiny else sd15_config()
    print("materializing params...", flush=True)
    if args.tiny:
        from theatergen_tpu.pipelines.bundle import init_bundle

        bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                             with_controlnet=True, with_vision=True)
    else:
        from theatergen_tpu.utils.fastinit import fast_bundle

        bundle = fast_bundle(cfg)

    results = {}
    for mode, window in [("wave", 0.25), ("serial", 0.0)]:
        with tempfile.TemporaryDirectory() as db:
            srv = TheaterServer(bundle, db, num_steps=args.num_steps,
                                max_wave=args.max_wave if mode == "wave"
                                else 1,
                                batch_window_s=window)
            try:
                # warm pass compiles the single + wave-width programs;
                # the timed pass measures steady state
                run_load(srv, args.sessions, args.turns, tag="warm")
                waves0 = srv.stats()["waves"]
                dt = run_load(srv, args.sessions, args.turns)
                stats = srv.stats()
                stats["waves"] -= waves0
            finally:
                srv.close()
        total = args.sessions * args.turns
        results[mode] = dict(seconds=round(dt, 2),
                             turns_per_min=round(60 * total / dt, 2),
                             waves=stats["waves"])
        print(f"{mode}: {total} turns in {dt:.1f}s "
              f"({results[mode]['turns_per_min']} turns/min, "
              f"{stats['waves']} waves)", flush=True)

    print(json.dumps({
        "metric": f"serving throughput, {args.sessions} sessions x "
                  f"{args.turns} turns",
        "wave": results["wave"], "serial": results["serial"],
        "speedup": round(results["serial"]["seconds"]
                         / max(results["wave"]["seconds"], 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
