"""End-to-end golden tests: the full `vireo` CLI on the bundled
reference demo data must reproduce the reference implementation's
donor_ids.tsv EXACTLY (same seed, same draw order) — the BASELINE.md
correctness target.

Goldens in tests/goldens/ were produced by running the reference CLI
(/root/reference/vireoSNP/vireo.py) with --randSeed 2; regenerate with
the commands in examples/demo.sh pointed at the reference package.
"""

import os

import numpy as np
import pytest

DATA = "/root/reference/data"
HERE = os.path.dirname(os.path.abspath(__file__))


def _read_ids(path):
    with open(path) as f:
        header = f.readline()
        rows = [ln.split("\t")[:2] for ln in f.read().splitlines()]
    assert header.startswith("cell\tdonor_id")
    return rows


def _run_cli(args, out_dir):
    from vireo_tpu.cli.vireo_cli import main
    main(args + ["-o", str(out_dir), "--randSeed", "2", "--noPlot"])
    return _read_ids(os.path.join(str(out_dir), "donor_ids.tsv"))


@pytest.mark.parametrize("mode,golden,args", [
    ("mode1_noGT", "donor_ids_mode1.tsv",
     ["-c", DATA + "/cellSNP_mat", "-N", "4"]),
    ("mode2_donorGT", "donor_ids_mode2.tsv",
     ["-c", DATA + "/cells.cellSNP.vcf.gz",
      "-d", DATA + "/donors.cellSNP.vcf.gz", "-N", "4"]),
    ("mode3_partialGT", "donor_ids_mode3.tsv",
     ["-c", DATA + "/cells.cellSNP.vcf.gz",
      "-d", DATA + "/donors.two.cellSNP.vcf.gz", "-N", "4"]),
    ("mode4_forceLearnGT", "donor_ids_mode4.tsv",
     ["-c", DATA + "/cells.cellSNP.vcf.gz",
      "-d", DATA + "/donors.cellSNP.vcf.gz", "-N", "4",
      "--forceLearnGT"]),
    ("mode5_subsetDonors", "donor_ids_mode5.tsv",
     ["-c", DATA + "/cells.cellSNP.vcf.gz",
      "-d", DATA + "/donors.cellSNP.vcf.gz", "-N", "3"]),
])
def test_cli_matches_reference_golden(mode, golden, args, tmp_path):
    golden_path = os.path.join(HERE, "goldens", golden)
    want = _read_ids(golden_path)
    got = _run_cli(args, tmp_path / mode)
    cells_w = [r[0] for r in want]
    cells_g = [r[0] for r in got]
    assert cells_w == cells_g
    ids_w = np.array([r[1] for r in want])
    ids_g = np.array([r[1] for r in got])
    n_diff = int((ids_w != ids_g).sum())
    assert n_diff == 0, ("%s: %d/%d donor calls differ from reference"
                         % (mode, n_diff, len(ids_w)))


def test_gtbarcode_matches_reference_golden(tmp_path):
    """GTbarcode on the reference's learned GT_donors VCF reproduces the
    reference's GT_barcodes.tsv exactly (randSeed 1, same greedy
    entropy loop and seeded tie-breaking; GTbarcode.py:16-121)."""
    from vireo_tpu.cli.gtbarcode_cli import main
    out = tmp_path / "GT_barcodes.tsv"
    main(["-i", os.path.join(HERE, "goldens", "GT_donors.ref.vcf.gz"),
          "-o", str(out), "--randSeed", "1", "--noPlot"])
    with open(out) as f, open(
            os.path.join(HERE, "goldens", "GT_barcodes.tsv")) as g:
        assert f.read() == g.read()


@pytest.mark.parametrize("mode,golden,extra", [
    ("ambient", "donor_ids_ambient.tsv", ["--callAmbientRNAs"]),
    ("ase", "donor_ids_ase.tsv", ["--ASEmode"]),
    ("cellrange", "donor_ids_cellrange.tsv", ["--cellRange", "100-600"]),
])
def test_cli_flag_goldens(mode, golden, extra, tmp_path):
    """--callAmbientRNAs / --ASEmode / --cellRange end-to-end vs fresh
    reference runs (goldens regenerated with /root/reference vireoSNP,
    --randSeed 2; see vireo.py:77-78,136-142,204-210)."""
    want = _read_ids(os.path.join(HERE, "goldens", golden))
    got = _run_cli(["-c", DATA + "/cellSNP_mat", "-N", "4"] + extra,
                   tmp_path / mode)
    assert [r[0] for r in want] == [r[0] for r in got]
    ids_w = np.array([r[1] for r in want])
    ids_g = np.array([r[1] for r in got])
    assert (ids_w == ids_g).all(), \
        "%s: %d/%d donor calls differ" % (mode, (ids_w != ids_g).sum(),
                                          len(ids_w))

    if mode == "ambient":
        # ambient proportions: f32 device EM vs the reference's f64
        # host EM — agree numerically, not textually
        ours = np.loadtxt(os.path.join(str(tmp_path), mode,
                                       "prop_ambient.tsv"),
                          skiprows=1, usecols=(1, 2, 3, 4))
        ref = np.loadtxt(os.path.join(HERE, "goldens",
                                      "prop_ambient.tsv"),
                         skiprows=1, usecols=(1, 2, 3, 4))
        np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_cli_mesh_flag(tmp_path):
    """--mesh 2x4 runs the demo through an explicit 2-D capacity mesh
    and still bit-matches the mode-1 golden; --mesh off disables."""
    from vireo_tpu.cli.vireo_cli import main, _resolve_cli_mesh
    assert _resolve_cli_mesh("off") is None
    assert _resolve_cli_mesh("auto") == "auto"
    out = tmp_path / "mesh2d"
    main(["-c", "/root/reference/data/cellSNP_mat", "-N", "4",
          "-o", str(out), "--randSeed", "2", "--noPlot",
          "--mesh", "2x4"])
    got = (out / "donor_ids.tsv").read_text().splitlines()
    want = open(os.path.join(HERE, "goldens",
                             "donor_ids_mode1.tsv")).read().splitlines()
    assert [g.split("\t")[1] for g in got[1:]] == \
        [w.split("\t")[1] for w in want[1:]]
