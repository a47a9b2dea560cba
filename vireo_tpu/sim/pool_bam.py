"""BAM-level pool synthesis (reference simulate/synth_pool.py workflow).

The reference simulator samples per-donor cell barcodes, relabels reads
with donor-suffixed barcodes, pairs a fraction of cells into synthetic
doublets, fetches reads at the SNP positions of a region VCF (sharded
into position ranges), deduplicates by read name, merges and
sorts/indexes the pooled BAM, and emits a ground-truth table
(synth_pool.py:23-95, 98-190, 194-404).

The full pipeline is implemented here against a small BAM-IO backend
interface: the default backend is pysam (+ sort/index), which is
external preprocessing and may be absent; the barcode bookkeeping,
position-range sharding, fetch, relabeling and dedupe logic are all
exercised by tests through an in-memory backend. Count-level synthesis
for engine benchmarking lives in sim/synth.py.
"""

import numpy as np

__all__ = ["sample_barcodes", "pool_barcodes", "pool_bams",
           "load_region_positions", "shard_regions", "fetch_reads",
           "relabel_dedupe_write"]


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


def load_region_positions(region_vcf):
    """(chroms, positions) of the SNPs in a region VCF — the positions
    at which reads are fetched (synth_pool.py:313-318)."""
    from ..io.vcf import load_VCF
    dat = load_VCF(region_vcf, load_sample=False)
    chroms = list(dat["FixedINFO"]["CHROM"])
    positions = [int(p) for p in dat["FixedINFO"]["POS"]]
    return chroms, positions


def shard_regions(chroms, positions, n_shards):
    """Split the SNP list into `n_shards` contiguous position-range
    chunks — the reference's Pool fan-out unit per (bam, range)
    (synth_pool.py:326-353). Returns a list of (chroms, positions)."""
    n = len(positions)
    n_shards = max(1, min(n_shards, n)) if n else 1
    bounds = np.linspace(0, n, n_shards + 1).astype(int)
    return [(chroms[a:b], positions[a:b])
            for a, b in zip(bounds[:-1], bounds[1:]) if b > a]


def relabel_dedupe_write(reads, barcode_map, cell_tag, sink, seen):
    """Core of the read pipeline (synth_pool.py:124-141,355-376):
    keep reads whose cell tag maps to a pooled barcode, rewrite the
    tag, and drop duplicate read names (`seen` persists across the
    fetches of one input BAM, so a read overlapping several SNPs is
    written once). Returns the number written."""
    written = 0
    for read in reads:
        if not read.has_tag(cell_tag):
            continue
        new_bc = barcode_map.get(read.get_tag(cell_tag))
        if new_bc is None:
            continue
        name = read.query_name
        if name in seen:
            continue
        seen.add(name)
        read.set_tag(cell_tag, new_bc)
        sink.write(read)
        written += 1
    return written


def fetch_reads(bam, regions, barcode_map, cell_tag, sink, seen):
    """Fetch reads overlapping each SNP position (the reference's
    [POS-1, POS) window, synth_pool.py:124) through the relabel +
    dedupe pipeline."""
    written = 0
    for chroms, positions in regions:
        for chrom, pos in zip(chroms, positions):
            written += relabel_dedupe_write(
                bam.fetch(chrom, pos - 1, pos), barcode_map, cell_tag,
                sink, seen)
    return written


class _PysamBackend:
    """Real BAM IO via pysam + samtools-equivalent sort/index."""

    def __init__(self):
        import pysam
        self.pysam = pysam

    def open(self, path):
        return self.pysam.AlignmentFile(path, "rb")

    def create(self, path, template):
        return self.pysam.AlignmentFile(path, "wb", template=template)

    def finalize(self, path, out_prefix):
        self.pysam.sort("-o", out_prefix + ".sorted.bam", path)
        self.pysam.index(out_prefix + ".sorted.bam")
        return out_prefix + ".sorted.bam"


def pool_bams(bam_files, barcode_lists, n_cells, out_prefix,
              doublet_rate=0.0, cell_tag="CB", region_vcf=None, nproc=4,
              rng=None, backend=None):
    """Merge donor BAMs into a synthetic pooled BAM with relabeled
    barcodes, read-name deduplication and a cell_info.tsv ground-truth
    table (reference pipeline synth_pool.py:194-404).

    `region_vcf`: when given, reads are fetched only at its SNP
    positions, sharded into `nproc` contiguous position ranges per BAM
    (the reference's Pool fan-out); otherwise each BAM is scanned
    whole. `backend` abstracts the BAM IO (defaults to pysam; tests
    inject an in-memory double).
    """
    if backend is None:
        try:
            backend = _PysamBackend()
        except ImportError as e:
            raise ImportError(
                "pool_bams requires pysam (and samtools) for read-level "
                "BAM surgery; install them or use "
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

    regions = None
    if region_vcf is not None:
        chroms, positions = load_region_positions(region_vcf)
        regions = shard_regions(chroms, positions, nproc)

    out_bam = out_prefix + ".pooled.bam"
    outf = None
    total = 0
    for d, bam_path in enumerate(bam_files):
        inf = backend.open(bam_path)
        if outf is None:
            outf = backend.create(out_bam, template=inf)
        donor_map = {b: mapping[b][0] for b in kept[d] if b in mapping}
        seen = set()   # read names already written from THIS input BAM
        if regions is not None:
            total += fetch_reads(inf, regions, donor_map, cell_tag,
                                 outf, seen)
        else:
            total += relabel_dedupe_write(
                inf.fetch(until_eof=True), donor_map, cell_tag, outf,
                seen)
        inf.close()
    if outf is None:
        return None
    outf.close()
    return backend.finalize(out_bam, out_prefix)
