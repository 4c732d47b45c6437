"""Roofline accounting for the benches: analytic bytes/FLOPs per step
against the MEASURED effective HBM bandwidth of this device/transport.

The numbers answer "is it actually fast, or merely faster than torch":
every bench reports achieved GB/s and pct_hbm_roofline next to its
throughput. Byte models are documented per call site; they count main
HBM traffic (table passes, edge-message materialization, candidate
streaming) and ignore O(B*d) terms that are <1% of a table pass.

EFFECTIVE_HBM_GBPS is the v5e HBM spec. Calibration: the dense Adagrad
step at Wikidata5M scale (2.3 GiB entity table, ~14 GB analytic traffic
per step) runs in 24.5 ms = ~574 GB/s achieved, i.e. ~70% of spec is
demonstrably reachable for large streaming+scatter programs on this
chip. (An earlier 95 GB/s "effective bandwidth" figure came from a
copy micro-probe that this transport distorts — small dispatches are
latency-floored over the tunnel; only large carried-scan workloads
measure honestly.) Low pct_hbm_roofline therefore means EITHER a real
bandwidth gap OR a latency/dispatch-bound workload whose buffers are
too small to stream (e.g. the FB15k-237 NegSamp step's 7 MB table).
"""

from __future__ import annotations

EFFECTIVE_HBM_GBPS = 819.0


def roofline(bytes_moved: float, flops: float, sec: float) -> dict:
    gbps = bytes_moved / sec / 1e9
    return {
        "achieved_GBps": round(gbps, 1),
        "pct_hbm_roofline": round(100.0 * gbps / EFFECTIVE_HBM_GBPS, 1),
        "GFLOPs_per_s": round(flops / sec / 1e9, 1),
    }


def negsamp_step_bytes(num_entities: int, num_relations: int, dim: int,
                       batch_size: int, num_neg: int,
                       dense_tables: bool = True) -> float:
    """Dense NegSamp train step: the cost is dominated by full passes
    over the [V, d] f32 entity table — dense grad materialization
    (write), optimizer read-modify-write of param + Adagrad accumulator
    (2 reads + 2 writes), and the grad read (1) = 6 passes; plus the
    batch-side gathers/scatter sources (3 slots + shared negatives)."""
    table = num_entities * dim * 4.0 + num_relations * dim * 4.0
    passes = 6.0 if dense_tables else 0.0
    gathers = (3 * batch_size + 2 * (num_neg + 1)) * dim * 4.0
    # forward + backward touch the gathered rows ~3x (score, grad wrt
    # queries, grad wrt candidates)
    return table * passes + gathers * 3.0


def negsamp_sparse_step_bytes(rows_e: int, rows_r: int, dim: int,
                              batch_size: int, num_neg: int) -> float:
    """Row-sparse NegSamp train step (tpu.sparse_updates): table traffic
    shrinks from O(V) passes to the TOUCHED rows — gather param rows
    (1 read), row-Adagrad read-modify-write of param + accumulator rows
    (2 reads + 2 writes), grad rows (1) = 6 row passes — plus the same
    batch-side forward/backward gather traffic as the dense model."""
    rows = (rows_e + rows_r) * dim * 4.0
    gathers = (3 * batch_size + 2 * (num_neg + 1)) * dim * 4.0
    return rows * 6.0 + gathers * 3.0


def negsamp_step_flops(dim: int, batch_size: int, num_neg: int) -> float:
    """Shared-negative scoring [B, num+1] dot products, forward + 2x
    backward."""
    return 2.0 * batch_size * (2 * (num_neg + 1) + 2) * dim * 3.0


def gnn_step_bytes(num_edges: int, dim: int, num_layers: int) -> float:
    """SPEED-OF-LIGHT traffic for full-graph message passing: per layer
    the unavoidable work is one [E, d] gather read fused into the
    segment reduction (messages never materializing), forward and
    backward — 2 edge passes per layer total. The real XLA program
    materializes messages (gather+scatter do not fuse — measured), so
    pct_hbm_roofline directly reports the distance to the ideal kernel.
    num_edges should already include inverse edges."""
    edge_pass = num_edges * dim * 4.0
    return edge_pass * 2.0 * num_layers


def eval_batch_bytes(num_entities: int, dim: int, cand_sides: int = 2
                     ) -> float:
    """Fused rank-count eval: per batch, the candidate table streams
    through VMEM once per side (sp and po candidate transforms)."""
    return cand_sides * num_entities * dim * 4.0


def eval_flops(num_entities: int, dim: int, batch_size: int) -> float:
    """Two [B, V] x d score matmuls per batch (sp + po)."""
    return 2.0 * 2.0 * batch_size * num_entities * dim
