"""Per-epoch graph subsampling for GNN encoders (reference:
kge/job/util.py:64-129)."""

from __future__ import annotations

import numpy as np


def sample_uniform(triples: np.ndarray, size: int, rng) -> np.ndarray:
    """Uniformly sample ``size`` edges from the training graph."""
    size = min(size, len(triples))
    idx = rng.choice(len(triples), size=size, replace=False)
    return triples[idx]


def sample_edge_neighbourhood(triples: np.ndarray, size: int, rng) -> np.ndarray:
    """Grow an edge sample that stays connected to already-picked entities:
    iteratively prefer edges incident to sampled entities (reference
    edge-neighbourhood sampler)."""
    size = min(size, len(triples))
    n = len(triples)
    chosen = np.zeros(n, dtype=bool)
    seen_entities: set = set()
    # start from a random edge
    first = int(rng.integers(n))
    chosen[first] = True
    seen_entities.update((int(triples[first, 0]), int(triples[first, 2])))
    count = 1
    # iterate in random order, preferring incident edges; loop until full
    while count < size:
        progressed = False
        for i in rng.permutation(n):
            if count >= size:
                break
            if chosen[i]:
                continue
            s, o = int(triples[i, 0]), int(triples[i, 2])
            if s in seen_entities or o in seen_entities:
                chosen[i] = True
                seen_entities.update((s, o))
                count += 1
                progressed = True
        if not progressed:
            # disconnected remainder: pick a fresh random edge
            remaining = np.flatnonzero(~chosen)
            i = int(rng.choice(remaining))
            chosen[i] = True
            seen_entities.update((int(triples[i, 0]), int(triples[i, 2])))
            count += 1
    return triples[chosen]
