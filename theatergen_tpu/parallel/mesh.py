"""Device mesh + sharding rules.

The reference has no distributed runtime at all (SURVEY.md §2.11: single
process, single GPU; SDXL's manual ``.to('cuda:N')`` placement is not
parallelism).  The TPU-native design is SPMD from the start:

- ``dp`` axis shards the benchmark batch — dialogues are the DP unit, since
  a dialogue's 4 turns are sequentially dependent (``generate.py:180-269``);
- ``tp`` axis shards attention head / FFN projections Megatron-style; SD1.5
  (859M params) fits per chip, so tp matters for SDXL and for latency
  scaling.

XLA GSPMD inserts the collectives (all-reduce over ``tp`` after row-sharded
matmuls, gradient all-reduce over ``dp``) from the shardings alone.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (v5e pods): ``jax.distributed.initialize`` with
    env-var defaults (the standard TPU pod launch contract).  Safe to call
    on single-host — it no-ops when no coordinator is configured."""
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
    )


def make_mesh(dp: int = -1, tp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('dp', 'tp') mesh. ``dp=-1`` → use all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# (regex over 'path/to/param', PartitionSpec) — first match wins.
# Dense kernels are [in, out]; "column" sharding puts the output dim on tp,
# "row" sharding the input dim (followed by an XLA-inserted all-reduce).
_TP_RULES = [
    # attention projections: q/k/v column-sharded, out row-sharded
    # (kernel_q = int8 serving twin, ops/quant.py; its per-output `scale`
    # vector shards with column-parallel layers, replicates with row ones)
    (re.compile(r".*/(to_q|to_k|to_v|to_k_ip|to_v_ip)/kernel(_q)?$"),
     P(None, "tp")),
    (re.compile(r".*/(to_q|to_k|to_v|to_k_ip|to_v_ip)/scale$"), P("tp")),
    (re.compile(r".*/(q_proj|k_proj|v_proj)/kernel(_q)?$"), P(None, "tp")),
    (re.compile(r".*/to_out_0/kernel(_q)?$"), P("tp", None)),
    (re.compile(r".*/out_proj/kernel$"), P("tp", None)),
    # transformer FFN: GEGLU proj column, net_2 row
    (re.compile(r".*/ff/net_0/proj/kernel(_q)?$"), P(None, "tp")),
    (re.compile(r".*/ff/net_0/proj/scale$"), P("tp")),
    (re.compile(r".*/ff/net_2/kernel(_q)?$"), P("tp", None)),
    (re.compile(r".*/mlp/fc1/kernel$"), P(None, "tp")),
    (re.compile(r".*/mlp/fc2/kernel$"), P("tp", None)),
    # time-embedding MLP (large: 1280×1280)
    (re.compile(r".*/time_embedding/linear_1/kernel(_q)?$"), P(None, "tp")),
    (re.compile(r".*/time_embedding/linear_1/scale$"), P("tp")),
    (re.compile(r".*/time_embedding/linear_2/kernel(_q)?$"), P("tp", None)),
]


def param_spec(path: str) -> P:
    for rx, spec in _TP_RULES:
        if rx.match(path):
            return spec
    return P()  # replicate


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Pytree of NamedShardings for a flax param tree."""

    def one(path, leaf):
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = param_spec(pstr)
        if any(s is not None for s in spec):
            # guard: uneven dims fall back to replication
            tp = mesh.shape["tp"]
            for dim, axis in enumerate(spec):
                if axis == "tp" and leaf.shape[dim] % tp != 0:
                    return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def sharding_coverage(mesh: Mesh, params: Any) -> dict:
    """What fraction of parameters the tp rules ACTUALLY shard.

    The uneven-dim guard in :func:`param_shardings` falls back to
    replication silently; this makes the fallback visible (VERDICT r1:
    report coverage instead of shipping speculative rules).  Returns
    ``{'total_params', 'sharded_params', 'fraction', 'matched_fraction',
    'fallback'}`` where ``fallback`` lists rule-matched paths whose dims
    don't divide by tp (replicated at runtime)."""
    tp = mesh.shape["tp"]
    total = sharded = matched = 0
    fallback = []

    def one(path, leaf):
        nonlocal total, sharded, matched
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = param_spec(pstr)
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        if any(s is not None for s in spec):
            matched += n
            ok = all(leaf.shape[dim] % tp == 0
                     for dim, axis in enumerate(spec) if axis == "tp")
            if ok:
                sharded += n
            else:
                fallback.append(pstr)
        return leaf

    jax.tree_util.tree_map_with_path(one, params)
    return {
        "total_params": total,
        "sharded_params": sharded,
        "fraction": sharded / max(total, 1),
        "matched_fraction": matched / max(total, 1),
        "fallback": fallback,
    }


_DTYPE_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1}
_COLL_SHAPE = re.compile(r"(bf16|f32|f16|s32|u32|s8)\[([\d,]*)\]")


def _payload_bytes(line: str, op: str) -> int:
    """Payload bytes of one collective line in optimized HLO: the result
    type(s) sit between ``=`` and ``<op>(`` (tuples list all)."""
    if f"{op}(" not in line or " = " not in line:
        return 0
    head = line.split(" = ", 1)[1].split(f"{op}(", 1)[0]
    total = 0
    for dt, dims in _COLL_SHAPE.findall(head):
        n = (int(np.prod([int(d) for d in dims.split(",") if d]))
             if dims else 1)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text: str) -> dict:
    """Count + payload bytes of the collectives in an optimized-HLO dump.

    This is the measured input behind recorded tp-vs-dp serving verdicts
    (BENCH_NOTES r4 tp section: 210 all-reduces / 2.517 GB per SDXL CFG
    step → dp-only).  ``tests/test_parallel.py`` pins these numbers so a
    sharding-rule edit that changes the collective budget fails loudly
    instead of silently invalidating the recorded decision
    (VERDICT r4 next-#7).

    Returns ``{op: {"count": n, "bytes": total_payload}}`` for each of
    all-reduce / all-gather / reduce-scatter / collective-permute."""
    ops = ("all-reduce", "all-gather", "reduce-scatter",
           "collective-permute")
    out = {op: {"count": 0, "bytes": 0} for op in ops}
    for line in hlo_text.splitlines():
        for op in ops:
            # async rewrites split an op into start/done pairs — count the
            # start (it carries the payload shape); a bare "op(" spelling
            # must not also match its own "-start(" line
            b = _payload_bytes(line, f"{op}-start")
            if not b and f"{op}-start(" not in line:
                b = _payload_bytes(line, op)
            if b:
                out[op]["count"] += 1
                out[op]["bytes"] += b
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Device-put a param tree according to the tp rules."""
    return jax.device_put(params, param_shardings(mesh, params))
