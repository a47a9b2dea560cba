"""Host-side VCF engine: streaming parse, genotype-probability decode,
variant/donor matching, and VCF writing.

Behavior-compatible with /root/reference/vireoSNP/utils/vcf_utils.py
(same dict structures and edge-case handling), re-implemented with
memoized decoding and vectorized matching for speed; this feeds the
device pipeline and never touches JAX.
"""

import gzip
import shutil
import subprocess

import numpy as np

from ..ops.matching import match, optimal_match

__all__ = ["parse_sample_info", "load_VCF", "write_VCF_to_hdf5",
           "read_sparse_GeneINFO", "GenoINFO_maker", "write_VCF",
           "parse_donor_GPb", "match_SNPs", "match_VCF_samples",
           "snp_gene_match"]


def parse_sample_info(sample_dat, sparse=True, format_list=None):
    """Parse per-sample FORMAT columns (vcf_utils.py:12-77).

    sample_dat: list over variants of [FORMAT, sample1, sample2, ...].
    sparse=True builds CSR-style triplets over non-missing entries and
    requires a uniform FORMAT across variants, like the reference.
    """
    if sample_dat == [] or sample_dat is None:
        return None

    format_all = [x[0].split(":") for x in sample_dat]
    if format_list is None:
        format_list = format_all[0]

    RV = {}
    n_SNP_tagged = np.zeros(len(format_list), np.int64)
    for _key in format_list:
        RV[_key] = []

    if sparse:
        fmt_set = set(format_list)
        if any(set(f) != fmt_set for f in format_all):
            raise ValueError(
                "Error: require the same format for all variants.")

        RV['indices'] = []
        RV['indptr'] = [0]
        RV['shape'] = (len(sample_dat[0][1:]), len(sample_dat))
        missing_val = ":".join(["."] * len(format_list))

        cnt = 0
        for j, _line in enumerate(sample_dat):
            key_idx = [format_all[j].index(_key) for _key in format_list]
            for i, entry in enumerate(_line[1:]):
                if entry == missing_val or entry == ".":
                    continue
                fields = entry.split(":")
                for k, _key in enumerate(format_list):
                    RV[_key].append(fields[key_idx[k]])
                cnt += 1
                RV['indices'].append(i)
                n_SNP_tagged += 1
            RV['indptr'].append(cnt)
    else:
        for j, _line in enumerate(sample_dat):
            fields = [x.split(":") for x in _line[1:]]
            for il, _key in enumerate(format_list):
                if _key in format_all[j]:
                    k = format_all[j].index(_key)
                    RV[_key].append([x[k] for x in fields])
                    n_SNP_tagged[il] += 1
                else:
                    RV[_key].append(["."] * len(fields))

    idx_low_tag = np.where(n_SNP_tagged < (0.1 * len(sample_dat)))[0]
    if len(idx_low_tag) > 0:
        print('[vireo] Warning: too few variants with tags!',
              '\t'.join([format_list[k] + ": " + str(n_SNP_tagged[k])
                         for k in range(len(format_list))]))

    return RV, n_SNP_tagged


def load_VCF(vcf_file, biallelic_only=False, load_sample=True, sparse=True,
             format_list=None):
    """Stream a (optionally gzip/bgzip) VCF into the reference's dict
    layout (vcf_utils.py:80-159)."""
    if vcf_file.endswith(".gz") or vcf_file.endswith(".bgz"):
        infile = gzip.open(vcf_file, "rt")
    else:
        infile = open(vcf_file, "r")

    FixedINFO = {}
    contig_lines = []
    comment_lines = []
    var_ids, obs_ids, obs_dat = [], [], []
    key_ids = []

    for line in infile:
        if line.startswith("#"):
            if line.startswith("##contig="):
                contig_lines.append(line.rstrip())
            if line.startswith("#CHROM"):
                if load_sample:
                    obs_ids = line.rstrip().split("\t")[9:]
                key_ids = line[1:].rstrip().split("\t")[:8]
                for _key in key_ids:
                    FixedINFO[_key] = []
            else:
                comment_lines.append(line.rstrip())
        else:
            list_val = line.rstrip().split("\t")
            if biallelic_only:
                if len(list_val[3]) > 1 or len(list_val[4]) > 1:
                    continue
            if load_sample:
                obs_dat.append(list_val[8:])
            for i, _key in enumerate(key_ids):
                FixedINFO[_key].append(list_val[i])
            var_ids.append("_".join([list_val[x] for x in [0, 1, 3, 4]]))
    infile.close()

    RV = {}
    RV["variants"] = var_ids
    RV["FixedINFO"] = FixedINFO
    RV["contigs"] = contig_lines
    RV["comments"] = comment_lines
    if load_sample:
        RV["samples"] = obs_ids
        RV["GenoINFO"], RV["n_SNP_tagged"] = parse_sample_info(
            obs_dat, sparse, format_list)
    return RV


def write_VCF_to_hdf5(VCF_dat, out_file):
    """Dump a parsed VCF dict to HDF5 (vcf_utils.py:162-189)."""
    import h5py
    with h5py.File(out_file, 'w') as f:
        for key in ["contigs", "samples", "variants", "comments"]:
            f.create_dataset(key, data=np.bytes_(VCF_dat[key]),
                             compression="gzip", compression_opts=9)
        fixed = f.create_group("FixedINFO")
        for _key in VCF_dat['FixedINFO']:
            fixed.create_dataset(
                _key, data=np.bytes_(VCF_dat['FixedINFO'][_key]),
                compression="gzip", compression_opts=9)
        geno = f.create_group("GenoINFO")
        for _key in VCF_dat['GenoINFO']:
            geno.create_dataset(
                _key, data=np.bytes_(VCF_dat['GenoINFO'][_key]),
                compression="gzip", compression_opts=9)


def read_sparse_GeneINFO(GenoINFO, keys=['AD', 'DP'], axes=[-1, -1]):
    """CSR matrices from sparse GenoINFO triplets (vcf_utils.py:192-205)."""
    from scipy.sparse import csr_matrix
    M, N = np.array(GenoINFO['shape']).astype('int')
    indptr = np.array(GenoINFO['indptr']).astype('int')
    indices = np.array(GenoINFO['indices']).astype('int')

    RV = {}
    for i, key in enumerate(keys):
        _dat = [x.split(",")[axes[i]] for x in GenoINFO[key]]
        data = np.array([x if x != '.' else '0' for x in _dat], dtype=float)
        RV[key] = csr_matrix((data, indices, indptr), shape=(N, M))
    return RV


def GenoINFO_maker(GT_prob, AD_reads, DP_reads):
    """Synthesize GT/AD/DP/PL FORMAT fields from estimated genotype
    probabilities and expected counts (vcf_utils.py:208-231)."""
    GT_prob = np.asarray(GT_prob, np.float64).copy()
    GT_val = np.argmax(GT_prob, axis=2)
    GT_prob[GT_prob < 1e-10] = 1e-10
    PL_prob = np.round(-10 * np.log10(GT_prob)).astype(int).astype(str)
    AD_reads = np.round(np.asarray(AD_reads)).astype(int).astype(str)
    DP_reads = np.round(np.asarray(DP_reads)).astype(int).astype(str)

    GT_codes = ['0/0', '1/0', '1/1']
    GT, PL, AD, DP = [], [], [], []
    for i in range(GT_prob.shape[0]):
        GT.append([GT_codes[x] for x in GT_val[i, :]])
        PL.append([",".join(list(x)) for x in PL_prob[i, :, :]])
        AD.append(list(AD_reads[i, :]))
        DP.append(list(DP_reads[i, :]))
    return {'GT': GT, 'AD': AD, 'DP': DP, 'PL': PL}


_FORMAT_HEADERS = {
    "GT": '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n',
    "AD": ('##FORMAT=<ID=AD,Number=1,Type=Integer,Description='
           '"Read depth for each allele">\n'),
    "DP": '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read Depth">\n',
    "PL": ('##FORMAT=<ID=PL,Number=G,Type=Integer,Description='
           '"Phred-scaled genotype likelihoods">\n'),
}


def write_VCF(out_file, VCF_dat, GenoTags=['GT', 'AD', 'DP', 'PL']):
    """Write a VCF with synthesized FORMAT headers, then bgzip/gzip
    (vcf_utils.py:234-296)."""
    out_file_use = out_file[:-3] if out_file.endswith(".gz") else out_file

    if "samples" not in VCF_dat:
        VCF_dat["samples"] = []
        if GenoTags != []:
            print("No sample available: GenoTags will be ignored.")

    with open(out_file_use, "w") as fid:
        for line in VCF_dat['comments']:
            tag_found = any(line.startswith("##FORMAT=<ID=" + tag)
                            for tag in GenoTags) \
                if line.startswith("##FORMAT=<ID=") else False
            if not tag_found:
                fid.write(line + "\n")

        for tag in GenoTags:
            if tag in _FORMAT_HEADERS:
                fid.write(_FORMAT_HEADERS[tag])

        VCF_COLUMN = ["CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER",
                      "INFO", "FORMAT"]
        fid.write("#" + "\t".join(VCF_COLUMN + list(VCF_dat['samples']))
                  + "\n")

        for i in range(len(VCF_dat['variants'])):
            line = [VCF_dat['FixedINFO'][x][i] for x in VCF_COLUMN[:8]]
            line.append(":".join(GenoTags))
            for s in range(len(VCF_dat['samples'])):
                line.append(":".join(
                    VCF_dat['GenoINFO'][_tag][i][s] for _tag in GenoTags))
            fid.write("\t".join(line) + "\n")

    tool = "bgzip" if shutil.which("bgzip") is not None else "gzip"
    pro = subprocess.Popen([tool, "-f", out_file_use],
                           stdout=subprocess.PIPE)
    pro.communicate()


def parse_donor_GPb(GT_dat, tag='GT', min_prob=0.0):
    """Decode GT/GP/PL codes into a (n_var, n_donor, 3) probability
    tensor (vcf_utils.py:299-336), with Phred decode
    10^(-0.1*(PL-min)-0.025) and missing -> uniform. Memoized per code
    string for speed on large panels."""
    if tag not in ('GT', 'GP', 'PL'):
        print("[parse_donor_GPb] Error: no support tag: %s" % tag)
        return None

    memo = {}

    def decode(code):
        hit = memo.get(code)
        if hit is not None:
            return hit
        if code in (".", "./.", ".|."):
            prob = np.array([1 / 3, 1 / 3, 1 / 3])
        elif tag == 'GT':
            prob = np.zeros(3)
            prob[int(float(code[0]) + float(code[-1]))] = 1
        elif tag == 'GP':
            prob = np.array(code.split(','), float)
        else:  # PL
            phred = np.array(code.split(','), float)
            prob = 10 ** (-0.1 * (phred - phred.min()) - 0.025)
        memo[code] = prob
        return prob

    n_var = len(GT_dat)
    n_donor = len(GT_dat[0]) if n_var else 0
    GT_prob = np.zeros((n_var, n_donor, 3))
    for i in range(n_var):
        row = GT_dat[i]
        for j in range(n_donor):
            GT_prob[i, j, :] = decode(row[j])

    GT_prob += min_prob
    GT_prob /= GT_prob.sum(axis=2, keepdims=True)
    return GT_prob


def match_SNPs(SNP_ids1, SNPs_ids2):
    """Variant matching tolerant to 'chr' prefixes (vcf_utils.py:339-350)."""
    mm_idx = match(SNP_ids1, SNPs_ids2)
    if np.mean(mm_idx == None) == 1:  # noqa: E711
        _SNP_ids1 = ["chr" + x for x in SNP_ids1]
        mm_idx = match(_SNP_ids1, SNPs_ids2)
    if np.mean(mm_idx == None) == 1:  # noqa: E711
        _SNP_ids2 = ["chr" + x for x in SNPs_ids2]
        mm_idx = match(SNP_ids1, _SNP_ids2)
    return mm_idx


def match_VCF_samples(VCF_file1, VCF_file2, GT_tag1, GT_tag2):
    """Match donors between two VCFs via Hungarian alignment on genotype
    probabilities (vcf_utils.py:353-420)."""
    vcf_dat0 = load_VCF(VCF_file1, biallelic_only=True, sparse=False,
                        format_list=[GT_tag1])
    GPb0_var_ids = np.array(vcf_dat0['variants'])
    GPb0_donor_ids = np.array(vcf_dat0['samples'])
    GPb0_tensor = parse_donor_GPb(vcf_dat0['GenoINFO'][GT_tag1], GT_tag1)
    print('Shape for Geno Prob in VCF1:', GPb0_tensor.shape)

    vcf_dat1 = load_VCF(VCF_file2, biallelic_only=True, sparse=False,
                        format_list=[GT_tag2])
    GPb1_var_ids = np.array(vcf_dat1['variants'])
    GPb1_donor_ids = np.array(vcf_dat1['samples'])
    GPb1_tensor = parse_donor_GPb(vcf_dat1['GenoINFO'][GT_tag2], GT_tag2)
    print('Shape for Geno Prob in VCF2:', GPb1_tensor.shape)

    mm_idx = match_SNPs(GPb1_var_ids, GPb0_var_ids)
    idx1 = np.where(mm_idx != None)[0]  # noqa: E711
    idx0 = mm_idx[idx1].astype(int)

    GPb1_tensor_use = GPb1_tensor[idx1]
    GPb0_tensor_use = GPb0_tensor[idx0]
    print("n_variants in VCF1, VCF2 and matched: %d, %d, %d"
          % (GPb0_var_ids.shape[0], GPb1_var_ids.shape[0], len(idx1)))

    idx0m, idx1m, GPb_diff = optimal_match(
        GPb0_tensor_use, GPb1_tensor_use, axis=1, return_delta=True)

    print("aligned donors:")
    print(GPb0_donor_ids[idx0m])
    print(GPb1_donor_ids[idx1m])

    RV = {}
    RV['matched_GPb_diff'] = GPb_diff[idx0m, :][:, idx1m]
    RV['matched_donors1'] = GPb0_donor_ids[idx0m]
    RV['matched_donors2'] = GPb1_donor_ids[idx1m]
    RV['full_GPb_diff'] = GPb_diff
    RV['full_donors1'] = GPb0_donor_ids
    RV['full_donors2'] = GPb1_donor_ids
    RV['matched_n_var'] = len(GPb0_var_ids[idx0])
    return RV


def snp_gene_match(varFixedINFO, gene_df, gene_key='gene', multi_gene=True,
                   gaps=[0, 1000, 10000, 100000], verbose=False):
    """Annotate SNPs with overlapping / nearby genes
    (vcf_utils.py:423-491)."""
    chrom_cur = 'None'
    gene_list = []
    flag_list = []
    gene_use = None

    for i in range(len(varFixedINFO['CHROM'])):
        _chrom = varFixedINFO['CHROM'][i]
        _pos = int(varFixedINFO['POS'][i])

        if chrom_cur != _chrom:
            gene_use = gene_df[gene_df['chrom'] == _chrom]
            chrom_cur = _chrom
            if verbose:
                print('processing:', _chrom)

        idx_chrom = []
        flag = len(gaps)
        for k, _gap in enumerate(gaps):
            flag = k
            _dist1 = gene_use['start'].values - _pos
            _dist2 = gene_use['stop'].values - _pos
            _distP = np.stack((_dist1, _dist2), axis=-1)
            _sign = np.sign(_dist1) * np.sign(_dist2)
            _dist = _sign * np.min(np.abs(_distP), axis=1)

            idx_chrom = np.where(_dist < _gap)[0]
            if len(idx_chrom) > 0:
                if _gap > 0 or multi_gene is False:
                    idx_chrom = [idx_chrom[np.argmin(_dist[idx_chrom])]]
                break

        if len(idx_chrom) == 0:
            flag = len(gaps)

        gene_list.append(gene_use[gene_key].values[idx_chrom])
        flag_list.append(flag)

    return gene_list, flag_list
