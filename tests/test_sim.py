"""Synthetic-pool generators: count-level accuracy harness and the
BAM-pool bookkeeping."""

import numpy as np
import jax.numpy as jnp
import pytest

from vireo_tpu.sim.synth import synth_pool_counts
from vireo_tpu.sim.pool_bam import sample_barcodes, pool_barcodes, pool_bams


def test_synth_pool_shapes_and_truth():
    d = synth_pool_counts(n_var=200, n_cell=300, n_donor=4,
                          doublet_rate=0.1, density=0.05, seed=3)
    assert d["AD"].shape == (200, 300)
    assert (d["DP"].data >= 1).all()
    assert ((d["donor"] >= 0) & (d["donor"] < 4)).all()
    n_dbl = (d["donor2"] >= 0).sum()
    assert abs(n_dbl - 30) <= 1
    # doublets never pair a donor with itself
    dbl = d["donor2"] >= 0
    assert (d["donor"][dbl] != d["donor2"][dbl]).all()


def test_synth_pool_recoverable():
    """The engine should demultiplex its own generative model."""
    from vireo_tpu.engine.wrap import vireo_wrap
    d = synth_pool_counts(n_var=400, n_cell=250, n_donor=3,
                          doublet_rate=0.0, density=0.08, seed=5)
    res = vireo_wrap(d["AD"], d["DP"], n_donor=3, n_init=5,
                     random_seed=1, check_doublet=False,
                     dtype=jnp.float64, verbose=False)
    pred = np.argmax(res["ID_prob"], axis=1)
    # best label permutation accuracy
    import itertools
    acc = max(np.mean(np.array(p)[pred] == d["donor"])
              for p in itertools.permutations(range(3)))
    assert acc > 0.97, acc


def test_sample_barcodes():
    rng = np.random.RandomState(0)
    lists = [["a%d" % i for i in range(20)], ["b%d" % i for i in range(30)]]
    out = sample_barcodes(lists, [5, 7], rng=rng)
    assert len(out[0]) == 5 and len(out[1]) == 7
    assert set(out[0]) <= set(lists[0])
    with pytest.raises(ValueError):
        sample_barcodes(lists, [25, 1], rng=rng)


def test_pool_barcodes_doublet_accounting():
    rng = np.random.RandomState(1)
    kept = [np.array(["a%d" % i for i in range(50)]),
            np.array(["b%d" % i for i in range(50)])]
    mapping, truth = pool_barcodes(kept, doublet_rate=0.25, rng=rng)
    # reference accounting: round(n / (1 + 1/d)) pairs merged
    n_pairs = int(round(100 / (1 + 1 / 0.25)))
    n_dbl = sum(1 for _, _, is_dbl in truth if is_dbl)
    assert n_dbl == n_pairs
    assert len(truth) == 100 - n_pairs
    assert len(mapping) == 100
    for bc, donors, is_dbl in truth:
        assert bc.endswith("D" if is_dbl else "S")


def test_pool_bams_requires_pysam():
    with pytest.raises(ImportError, match="pysam"):
        pool_bams(["x.bam"], [["a"]], [1], "/tmp/x")
