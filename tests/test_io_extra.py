"""Coverage for the long-tail IO / util / plot surface:
match_VCF_samples, snp_gene_match, write_VCF_to_hdf5, make_whitelists,
greed_match, logbincoeff, and the matplotlib figures (Agg backend)."""

import gzip
import os

import numpy as np
import pytest

DATA = "/root/reference/data"


def test_match_vcf_samples_self_identity():
    from vireo_tpu.io.vcf import match_VCF_samples
    res = match_VCF_samples(DATA + "/donors.cellSNP.vcf.gz",
                            DATA + "/donors.cellSNP.vcf.gz",
                            GT_tag1="PL", GT_tag2="PL")
    # a VCF matched to itself aligns each donor with itself
    assert list(res["matched_donors1"]) == list(res["matched_donors2"])
    assert np.allclose(np.diag(res["matched_GPb_diff"]), 0.0, atol=1e-12)


def test_match_vcf_samples_parity(reference):
    from vireo_tpu.io.vcf import match_VCF_samples
    ours = match_VCF_samples(DATA + "/donors.two.cellSNP.vcf.gz",
                             DATA + "/donors.cellSNP.vcf.gz",
                             GT_tag1="PL", GT_tag2="PL")
    ref = reference.vcf.match_VCF_samples(
        DATA + "/donors.two.cellSNP.vcf.gz",
        DATA + "/donors.cellSNP.vcf.gz", GT_tag1="PL", GT_tag2="PL")
    assert list(ours["matched_donors1"]) == list(ref["matched_donors1"])
    assert list(ours["matched_donors2"]) == list(ref["matched_donors2"])
    np.testing.assert_allclose(ours["full_GPb_diff"],
                               ref["full_GPb_diff"], rtol=1e-8)


def test_snp_gene_match_parity(reference):
    import pandas as pd
    from vireo_tpu.io.vcf import snp_gene_match, load_VCF

    vcf = load_VCF(DATA + "/cellSNP_mat/cellSNP.base.vcf.gz",
                   load_sample=False, biallelic_only=False)
    fixed = {k: v[:200] for k, v in vcf["FixedINFO"].items()}
    pos = np.array([int(x) for x in fixed["POS"]])
    gene_df = pd.DataFrame({
        "chrom": fixed["CHROM"],
        "start": pos - 50,
        "stop": pos + 50,
        "gene": ["g%d" % i for i in range(len(pos))],
    })
    ours = snp_gene_match(fixed, gene_df)
    ref = reference.vcf.snp_gene_match(fixed, gene_df)
    assert ours[1] == list(ref[1])
    for a, b in zip(ours[0], ref[0]):
        assert list(a) == list(b)


def test_write_vcf_to_hdf5_roundtrip(tmp_path):
    h5py = pytest.importorskip("h5py")
    from vireo_tpu.io.vcf import load_VCF, write_VCF_to_hdf5

    vcf = load_VCF(DATA + "/donors.cellSNP.vcf.gz", biallelic_only=True,
                   sparse=False, format_list=["GT"])
    out = str(tmp_path / "donors.h5")
    write_VCF_to_hdf5(vcf, out)
    with h5py.File(out, "r") as f:
        assert [x.decode() for x in f["variants"][:]] == vcf["variants"]
        assert [x.decode() for x in f["samples"][:]] == vcf["samples"]
        assert "GT" in f["GenoINFO"]


def test_make_whitelists(tmp_path):
    from vireo_tpu.io.matrices import make_whitelists
    ids_file = tmp_path / "donor_ids.tsv"
    ids_file.write_text(
        "cell\tdonor_id\nA-1\td0\nB-1\td1\nC-1\td0\nD-1\tdoublet\n")
    make_whitelists(str(ids_file), str(tmp_path / "wl"))
    got = open(tmp_path / "wl_d0.txt").read().split()
    assert got == ["A", "C"]  # barcode suffix stripped (io_utils.py:185)
    assert not os.path.exists(tmp_path / "wl_doublet.txt")


def test_greed_match_and_logbincoeff(reference):
    from vireo_tpu.base import greed_match, logbincoeff

    rng = np.random.RandomState(0)
    X = rng.rand(50, 4, 3)
    perm = [2, 0, 3, 1]
    Y = X[:, perm, :]
    idx = greed_match(X, Y)
    ref_idx = reference.base.greed_match(X, Y)
    assert list(idx) == list(ref_idx)

    n = np.array([10.0, 100.0, 7.0])
    k = np.array([3.0, 42.0, 0.0])
    np.testing.assert_allclose(
        logbincoeff(n, k),
        reference.base.logbincoeff(n, k), rtol=1e-10)


def test_plots_render(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from vireo_tpu.plot.base_plot import (heat_matrix, plot_GT,
                                          minicode_plot, anno_heat,
                                          vireo_colors)

    assert len(vireo_colors) == 14

    X = np.random.RandomState(0).rand(4, 4)
    plt.figure()
    heat_matrix(X, yticks=list("abcd"), xticks=list("wxyz"))
    plt.savefig(tmp_path / "hm.png")
    plt.close()

    GT_prob = np.random.RandomState(1).dirichlet(
        np.ones(3), size=(30, 4)).reshape(30, 4, 3)
    plot_GT(str(tmp_path), GT_prob, ["d%d" % i for i in range(4)])

    # GTbarcode-style codes: 'b' + one genotype digit per donor
    barcodes = ["b0102", "b2110", "b1021"]
    plt.figure()
    minicode_plot(barcodes, var_ids=["v%d" % i for i in range(4)],
                  sample_ids=["s%d" % i for i in range(len(barcodes))])
    plt.savefig(tmp_path / "mc.png")
    plt.close()

    fig = anno_heat(np.random.RandomState(3).rand(20, 8),
                    row_anno=["r%d" % (i % 2) for i in range(20)],
                    col_anno=["c%d" % (i % 2) for i in range(8)])
    fig.savefig(tmp_path / "ah.png")
