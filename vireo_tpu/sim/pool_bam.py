"""BAM-level pool synthesis (reference simulate/synth_pool.py workflow).

The reference simulator samples per-donor cell barcodes, relabels reads
with donor-suffixed barcodes, pairs a fraction of cells into synthetic
doublets, merges the BAMs, and emits a ground-truth table
(synth_pool.py:23-95, 194-404). The barcode/doublet bookkeeping — the
algorithmic core — is implemented here host-side and unit-testable;
the read-level BAM surgery requires pysam + samtools, which are gated
with a clear error (they are external preprocessing, not part of the
engine; count-level synthesis lives in sim/synth.py).
"""

import numpy as np

__all__ = ["sample_barcodes", "pool_barcodes", "pool_bams"]


def sample_barcodes(barcode_lists, n_cells, rng=None):
    """Subsample `n_cells[i]` barcodes from each donor's barcode list.

    Mirrors synth_pool.py:23-36. Returns a list of arrays.
    """
    if rng is None:
        rng = np.random
    out = []
    for i, bl in enumerate(barcode_lists):
        bl = np.asarray(bl)
        n = int(n_cells[i])
        if n > len(bl):
            raise ValueError(
                "donor %d has %d barcodes, requested %d" % (i, len(bl), n))
        idx = rng.choice(len(bl), size=n, replace=False)
        out.append(bl[np.sort(idx)])
    return out


def pool_barcodes(barcodes_per_donor, doublet_rate=0.0, rng=None):
    """Assign pooled identities, pairing cells into doublets.

    Replicates the reference's doublet accounting
    (synth_pool.py:39-95): with doublet rate d over n kept cells, the
    number of barcode pairs merged is round(n / (1 + 1/d)); merged
    cells keep the first cell's barcode. Singlet barcodes get an 'S'
    suffix convention in the truth table, doublets 'D'.

    Returns (mapping, truth_rows):
      mapping: dict old_barcode -> (new_barcode, donor_ids tuple)
      truth_rows: list of (new_barcode, donor_label, is_doublet)
    """
    if rng is None:
        rng = np.random

    flat = []
    for d, bcs in enumerate(barcodes_per_donor):
        for b in bcs:
            flat.append((b, d))
    n = len(flat)
    n_doublet_pairs = int(round(n / (1.0 + 1.0 / doublet_rate))) \
        if doublet_rate > 0 else 0

    order = rng.permutation(n)
    pair_members = order[:2 * n_doublet_pairs]
    mapping = {}
    truth_rows = []

    for k in range(n_doublet_pairs):
        i, j = pair_members[2 * k], pair_members[2 * k + 1]
        b1, d1 = flat[i]
        b2, d2 = flat[j]
        new_bc = b1 + "D"
        mapping[b1] = (new_bc, (d1, d2))
        mapping[b2] = (new_bc, (d1, d2))
        truth_rows.append((new_bc, "%d,%d" % tuple(sorted((d1, d2))), True))

    for idx in order[2 * n_doublet_pairs:]:
        b, d = flat[idx]
        new_bc = b + "S"
        mapping[b] = (new_bc, (d,))
        truth_rows.append((new_bc, "%d" % d, False))

    return mapping, truth_rows


def pool_bams(bam_files, barcode_lists, n_cells, out_prefix,
              doublet_rate=0.0, cell_tag="CB", nproc=4, rng=None):
    """Merge donor BAMs into a synthetic pooled BAM with relabeled
    barcodes and a cell_info.tsv ground-truth table.

    Requires pysam and samtools (external preprocessing tools).
    """
    try:
        import pysam  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "pool_bams requires pysam (and samtools) for read-level BAM "
            "surgery; install them or use "
            "vireo_tpu.sim.synth.synth_pool_counts for count-level "
            "synthesis with ground truth.") from e

    if rng is None:
        rng = np.random
    kept = sample_barcodes(barcode_lists, n_cells, rng=rng)
    mapping, truth = pool_barcodes(kept, doublet_rate, rng=rng)

    with open(out_prefix + ".cell_info.tsv", "w") as fid:
        fid.write("barcode\tdonors\tis_doublet\n")
        for bc, donors, is_dbl in truth:
            fid.write("%s\t%s\t%d\n" % (bc, donors, int(is_dbl)))

    out_bam = out_prefix + ".pooled.bam"
    outf = None
    for d, bam in enumerate(bam_files):
        inf = pysam.AlignmentFile(bam, "rb")
        if outf is None:
            outf = pysam.AlignmentFile(out_bam, "wb", template=inf)
        donor_map = {b: mapping[b] for b in kept[d] if b in mapping}
        for read in inf.fetch(until_eof=True):
            try:
                bc = read.get_tag(cell_tag)
            except KeyError:
                continue
            hit = donor_map.get(bc)
            if hit is None:
                continue
            read.set_tag(cell_tag, hit[0])
            outf.write(read)
        inf.close()
    if outf is not None:
        outf.close()
        pysam.sort("-o", out_prefix + ".sorted.bam", out_bam)
        pysam.index(out_prefix + ".sorted.bam")
    return out_prefix + ".sorted.bam"
