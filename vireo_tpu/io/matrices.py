"""Matrix/result IO: cellSNP + vartrix readers and result writers.

Behavior-compatible with /root/reference/vireoSNP/utils/io_utils.py,
including the hard-call thresholds in `write_donor_id`
(prob_max < 0.9 -> unassigned, doublet >= 0.9 -> doublet,
n_vars < 10 -> unassigned; io_utils.py:97-108).
"""

import subprocess
from itertools import combinations

import numpy as np

from .vcf import load_VCF, match_SNPs

__all__ = ["match_donor_VCF", "read_cellSNP", "read_vartrix", "read_mtx",
           "write_donor_id", "make_whitelists"]


def read_mtx(path):
    """Fast MatrixMarket coordinate reader -> scipy CSC.

    Drop-in for scipy.io.mmread(...).tocsc() on cellSNP outputs: the
    native C++ parser when available, else np.loadtxt over the body.
    """
    import scipy.sparse as sp
    from .fast import read_mtx_fast
    fast = read_mtx_fast(path)
    if fast is not None:
        return fast
    opener = open
    if path.endswith(".gz"):
        import gzip
        opener = gzip.open
    with opener(path, "rt") as f:
        header = f.readline()
        if not header.startswith("%%MatrixMarket"):
            raise ValueError("not a MatrixMarket file: %s" % path)
        line = f.readline()
        while line.startswith("%"):
            line = f.readline()
        n_row, n_col, nnz = (int(x) for x in line.split())
        body = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if body.size == 0:
        body = np.zeros((0, 3))
    rows = body[:, 0].astype(np.int64) - 1
    cols = body[:, 1].astype(np.int64) - 1
    vals = body[:, 2]
    return sp.csc_matrix((vals, (rows, cols)), shape=(n_row, n_col))


def match_donor_VCF(cell_dat, donor_vcf):
    """Subset cell data and donor VCF to their matched variants
    (io_utils.py:10-39)."""
    mm_idx = match_SNPs(cell_dat['variants'], donor_vcf['variants'])
    idx1 = np.where(mm_idx != None)[0]  # noqa: E711
    if len(idx1) == 0:
        print("[vireo] warning: no variants matched to donor VCF, "
              "please check chr format!")
    else:
        print("[vireo] %d out %d variants matched to donor VCF"
              % (len(idx1), len(cell_dat['variants'])))
    idx2 = mm_idx[idx1].astype(int)

    cell_dat['AD'] = cell_dat['AD'][idx1, :]
    cell_dat['DP'] = cell_dat['DP'][idx1, :]
    cell_dat["variants"] = [cell_dat["variants"][x] for x in idx1]
    for _key in cell_dat["FixedINFO"].keys():
        cell_dat["FixedINFO"][_key] = [
            cell_dat["FixedINFO"][_key][x] for x in idx1]

    donor_vcf["variants"] = [donor_vcf["variants"][x] for x in idx2]
    for _key in donor_vcf["FixedINFO"].keys():
        donor_vcf["FixedINFO"][_key] = [
            donor_vcf["FixedINFO"][_key][x] for x in idx2]
    for _key in donor_vcf["GenoINFO"].keys():
        donor_vcf["GenoINFO"][_key] = [
            donor_vcf["GenoINFO"][_key][x] for x in idx2]

    return cell_dat, donor_vcf


def _load_variants(vcf_file):
    """Variant-id-only VCF load; native fast path when available."""
    from .fast import load_variants_fast
    dat = load_variants_fast(vcf_file)
    if dat is None:
        dat = load_VCF(vcf_file, load_sample=False, biallelic_only=False)
    return dat


def read_cellSNP(dir_name, layers=['AD', 'DP']):
    """Read a cellSNP output folder (io_utils.py:42-59)."""
    cell_dat = _load_variants(dir_name + "/cellSNP.base.vcf.gz")
    for _layer in layers:
        cell_dat[_layer] = read_mtx(
            dir_name + "/cellSNP.tag.%s.mtx" % _layer)
    cell_dat['samples'] = np.genfromtxt(
        dir_name + "/cellSNP.samples.tsv", dtype=str)
    return cell_dat


def read_vartrix(alt_mtx, ref_mtx, cell_file, vcf_file=None):
    """Read VarTrix outputs; DP = REF + ALT (io_utils.py:62-88)."""
    if vcf_file is not None:
        cell_dat = _load_variants(vcf_file)
        cell_dat['variants'] = np.array(cell_dat['variants'])
    else:
        cell_dat = {}
    cell_dat['AD'] = read_mtx(alt_mtx)
    cell_dat['DP'] = read_mtx(ref_mtx) + cell_dat['AD']
    cell_dat['samples'] = np.genfromtxt(cell_file, dtype=str)
    return cell_dat


def write_donor_id(out_dir, donor_names, cell_names, n_vars, res_vireo):
    """Write donor_ids.tsv, summary.tsv, probability tables and the log
    (io_utils.py:91-170), with the reference's hard-call rules."""
    ID_prob, doublet_prob = res_vireo['ID_prob'], res_vireo['doublet_prob']

    prob_max = np.max(ID_prob, axis=1)
    prob_doublet_out = np.max(doublet_prob, axis=1)
    donor_singlet = np.array(donor_names, "U100")[np.argmax(ID_prob, axis=1)]

    doublet_names = [",".join(x) for x in combinations(donor_names, 2)]
    donor_doublet = np.array(doublet_names, "U100")[
        np.argmax(doublet_prob, axis=1)]

    donor_ids = donor_singlet.copy()
    donor_ids[prob_max < 0.9] = "unassigned"
    donor_ids[prob_doublet_out >= 0.9] = "doublet"
    donor_ids[np.asarray(n_vars) < 10] = "unassigned"

    with open(out_dir + "/_log.txt", "w") as fid:
        fid.write("logLik: %.3e\n" % (res_vireo['LB_doublet']))
        fid.write("thetas: \n%s\n" % (res_vireo['theta_shapes']))

    donor_ids_uniq, donor_ids_count = np.unique(donor_ids,
                                                return_counts=True)
    with open(out_dir + "/summary.tsv", "w") as fid:
        fid.write("Var1\tFreq\n")
        for i in range(len(donor_ids_uniq)):
            fid.write("%s\t%d\n" % (donor_ids_uniq[i], donor_ids_count[i]))
    print("[vireo] final donor size:")
    print("\t".join([str(x) for x in donor_ids_uniq]))
    print("\t".join([str(x) for x in donor_ids_count]))

    with open(out_dir + "/donor_ids.tsv", "w") as fid:
        header = ["cell", "donor_id", "prob_max", "prob_doublet", "n_vars",
                  "best_singlet", "best_doublet", "doublet_logLikRatio"]
        fid.write("\t".join(header) + "\n")
        for i in range(len(cell_names)):
            line = [cell_names[i], donor_ids[i], "%.2e" % prob_max[i],
                    "%.2e" % prob_doublet_out[i], "%d" % n_vars[i],
                    donor_singlet[i], donor_doublet[i],
                    "%.3f" % res_vireo['doublet_LLR'][i]]
            fid.write("\t".join(line) + "\n")

    with open(out_dir + "/prob_singlet.tsv", "w") as fid:
        fid.write("\t".join(["cell"] + list(donor_names)) + "\n")
        for i in range(len(cell_names)):
            line = ["%.2e" % x for x in ID_prob[i, :]]
            fid.write("\t".join([cell_names[i]] + line) + "\n")

    with open(out_dir + "/prob_doublet.tsv", "w") as fid:
        fid.write("\t".join(["cell"] + doublet_names) + "\n")
        for i in range(len(cell_names)):
            line = ["%.2e" % x for x in doublet_prob[i, :]]
            fid.write("\t".join([cell_names[i]] + line) + "\n")

    if res_vireo.get('ambient_Psi') is not None:
        with open(out_dir + "/prop_ambient.tsv", "w") as fid:
            fid.write("\t".join(["cell"] + list(donor_names)
                                + ['logLik_ratio']) + "\n")
            for i in range(len(cell_names)):
                line = ["%.4e" % x for x in res_vireo['ambient_Psi'][i, :]]
                line += ['%.2f' % res_vireo['Psi_LLRatio'][i]]
                fid.write("\t".join([cell_names[i]] + line) + "\n")

    pro = subprocess.Popen(
        ["gzip", "-f", out_dir + "/prob_singlet.tsv",
         out_dir + "/prob_doublet.tsv"], stdout=subprocess.PIPE)
    pro.communicate()


def make_whitelists(donor_id_file, out_prefix):
    """Per-donor barcode whitelists for umi_tools (io_utils.py:172-185)."""
    table = np.genfromtxt(donor_id_file, dtype='str', delimiter='\t')[1:, :]
    table = table[table[:, 1] != 'unassigned', :]
    table = table[table[:, 1] != 'doublet', :]

    for _donor in np.unique(table[:, 1]):
        idx = table[:, 1] == _donor
        barcodes = table[idx, 0]
        with open(out_prefix + "_%s.txt" % _donor, "w") as fid:
            for _line in barcodes:
                fid.write(_line.split('-')[0] + '\n')
