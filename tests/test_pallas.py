"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kge_tpu.ops.pallas.rank_count import rank_counts, rank_counts_xla


@pytest.mark.parametrize("B,C,D", [(10, 50, 16), (300, 3000, 64)])
def test_rank_counts_matches_xla(B, C, D):
    k = jax.random.PRNGKey(0)
    q = jax.random.normal(k, (B, D))
    cand = jax.random.normal(jax.random.fold_in(k, 1), (C, D))
    true = jnp.asarray(np.asarray(q @ cand.T)[:, 0])  # true = candidate 0
    cand_valid = jnp.asarray((np.arange(C) % 7 != 3).astype(np.float32))
    r1, t1 = rank_counts(q, cand, true, cand_valid, interpret=True,
                         tb=128, tc=512)
    r2, t2 = rank_counts_xla(q, cand, true, cand_valid)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # the true score ties with itself (candidate 0 is valid)
    assert (np.asarray(t1) >= 1).all()


def test_rank_counts_tie_tolerances():
    # scores engineered around the tolerance boundary
    q = jnp.asarray([[1.0]])
    cand = jnp.asarray([[1.0], [1.0 + 5e-6], [1.5], [0.5]])
    true = jnp.asarray([1.0])
    valid = jnp.ones(4)
    r, t = rank_counts(q, cand, true, valid, atol=1e-5, rtol=1e-4,
                       interpret=True, tb=8, tc=128)
    # 1.5 is greater; 1.0 and 1.0+5e-6 are ties; 0.5 is below
    assert int(r[0]) == 1
    assert int(t[0]) == 2
