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


# ---------------------------------------------------------------------
# Read-level pool pipeline (pool_bams) through an in-memory BAM
# backend: position fetch from a region VCF, barcode relabeling,
# read-name dedupe, sharding (synth_pool.py:98-190,326-376 semantics).
# ---------------------------------------------------------------------

class FakeRead:
    def __init__(self, name, chrom, pos, tags):
        self.query_name = name
        self.chrom, self.pos = chrom, pos
        self.tags = dict(tags)

    def has_tag(self, t):
        return t in self.tags

    def get_tag(self, t):
        return self.tags[t]

    def set_tag(self, t, v):
        self.tags[t] = v


class FakeBam:
    def __init__(self, reads):
        self.reads = reads

    def fetch(self, chrom=None, start=None, stop=None, until_eof=False):
        if chrom is None:
            yield from self.reads
            return
        for r in self.reads:
            if r.chrom == chrom and start <= r.pos < stop:
                yield r

    def close(self):
        pass


class FakeSink(list):
    def write(self, read):
        self.append(read)

    def close(self):
        pass


class FakeBackend:
    """In-memory double of the pysam backend. The pooled output sink
    is `self.sink`; shard temp files live in `self.temps` until the
    dedupe merge removes them."""

    def __init__(self, bams):
        self.bams = bams
        self.sink = FakeSink()
        self.temps = {}
        self.finalized = None

    def open(self, path):
        return self.bams[path]

    def create(self, path, template):
        if str(path).endswith(".pooled.bam"):
            return self.sink
        t = FakeSink()
        self.temps[path] = t
        return t

    def read_all(self, path):
        return iter(self.temps[path])

    def remove(self, path):
        del self.temps[path]

    def finalize(self, path, out_prefix):
        self.finalized = out_prefix + ".sorted.bam"
        return self.finalized


def _region_vcf(tmp_path, rows):
    p = tmp_path / "regions.vcf"
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for chrom, pos in rows:
        lines.append("%s\t%d\t.\tA\tC\t.\tPASS\t." % (chrom, pos))
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_shard_regions_contiguous_cover():
    from vireo_tpu.sim.pool_bam import shard_regions
    chroms = ["1"] * 7 + ["2"] * 6
    positions = list(range(100, 113))
    shards = shard_regions(chroms, positions, 4)
    assert sum(len(p) for _, p in shards) == 13
    flat = [p for _, p in shards for p in p]
    assert flat == positions                      # order preserved
    assert len(shards) == 4


def test_pool_bams_fetch_dedupe_relabel(tmp_path):
    from vireo_tpu.sim.pool_bam import pool_bams

    # donor 0: read r1 overlaps TWO SNP positions (must be written
    # once); read r2 has an unknown barcode (dropped); read r3 has no
    # CB tag (dropped). donor 1: r4 kept.
    bam0 = FakeBam([
        FakeRead("r1", "1", 100, {"CB": "AAA"}),
        FakeRead("r1", "1", 105, {"CB": "AAA"}),
        FakeRead("r2", "1", 100, {"CB": "ZZZ"}),
        FakeRead("r3", "1", 105, {}),
    ])
    bam1 = FakeBam([
        FakeRead("r4", "1", 105, {"CB": "BBB"}),
        FakeRead("r5", "2", 50, {"CB": "BBB"}),   # off-SNP: dropped
    ])
    backend = FakeBackend({"d0.bam": bam0, "d1.bam": bam1})
    vcf = _region_vcf(tmp_path, [("1", 101), ("1", 106)])

    rng = np.random.RandomState(0)
    out = pool_bams(["d0.bam", "d1.bam"], [["AAA"], ["BBB"]], [1, 1],
                    str(tmp_path / "pool"), doublet_rate=0.0,
                    region_vcf=vcf, nproc=2, rng=rng, backend=backend)
    assert out == str(tmp_path / "pool") + ".sorted.bam"

    names = sorted(r.query_name for r in backend.sink)
    assert names == ["r1", "r4"]                  # deduped + filtered
    tags = {r.query_name: r.get_tag("CB") for r in backend.sink}
    assert tags["r1"].startswith("AAA") and tags["r1"].endswith("S")
    assert tags["r4"].startswith("BBB") and tags["r4"].endswith("S")

    truth = (tmp_path / "pool.cell_info.tsv").read_text().splitlines()
    assert truth[0] == "barcode\tdonors\tis_doublet"
    assert len(truth) == 3


def test_pool_bams_whole_file_and_doublets(tmp_path):
    from vireo_tpu.sim.pool_bam import pool_bams

    reads = [FakeRead("r%d" % i, "1", i, {"CB": bc})
             for i, bc in enumerate(["A", "B", "C", "D"])]
    backend = FakeBackend({"x.bam": FakeBam(reads)})
    rng = np.random.RandomState(3)
    pool_bams(["x.bam"], [["A", "B", "C", "D"]], [4],
              str(tmp_path / "p2"), doublet_rate=0.5, rng=rng,
              backend=backend)
    # doublet pairs: round(4 / (1 + 1/0.5)) = 1 pair -> the two merged
    # cells share one pooled barcode ending in D
    tags = [r.get_tag("CB") for r in backend.sink]
    assert len(tags) == 4
    d_tags = [t for t in tags if t.endswith("D")]
    assert len(d_tags) == 2 and len(set(d_tags)) == 1
    truth = (tmp_path / "p2.cell_info.tsv").read_text().splitlines()
    assert len(truth) == 4                        # header + 2S + 1D


def test_pool_bams_parallel_matches_serial(tmp_path):
    """The threaded shard fan-out (nproc>1) produces exactly the serial
    result: same reads, same relabeling, duplicates across shard
    boundaries removed at merge."""
    from vireo_tpu.sim.pool_bam import pool_bams

    barcodes = ["BC%02d" % i for i in range(8)]

    def make_reads():  # fresh objects per run (relabeling mutates tags)
        return [FakeRead("r%03d" % (i % 120), "1", 10 + (i * 13) % 400,
                         {"CB": barcodes[i % len(barcodes)]})
                for i in range(300)]

    vcf = _region_vcf(tmp_path, [("1", p) for p in range(11, 411, 7)])

    def run(nproc, tag):
        backend = FakeBackend({"x.bam": FakeBam(make_reads())})
        rng = np.random.RandomState(7)
        pool_bams(["x.bam"], [barcodes], [len(barcodes)],
                  str(tmp_path / tag), doublet_rate=0.0, region_vcf=vcf,
                  nproc=nproc, rng=rng, backend=backend)
        assert not backend.temps        # all shard temps consumed
        return [(r.query_name, r.get_tag("CB")) for r in backend.sink]

    serial = run(1, "ser")
    parallel = run(4, "par")
    assert len(serial) > 0
    assert sorted(serial) == sorted(parallel)
    names = [n for n, _ in parallel]
    assert len(names) == len(set(names))          # deduped


def test_sim_cli_help_and_errors(tmp_path):
    import subprocess
    import sys
    out = subprocess.run(
        [sys.executable, "-m", "vireo_tpu.sim.pool_bam", "--help"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "--samFiles" in out.stdout and "--doubletRate" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "vireo_tpu.sim.pool_bam",
         "-s", "a.bam", "-b", "a.tsv", "-r", "x.vcf", "--noregionFile"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode != 0
    assert "mutually exclusive" in out.stderr


def test_pool_bams_real_pysam_smoke(tmp_path):
    """Gated real-BAM execution: build a tiny BAM with pysam, pool it
    at SNP positions, and check the sorted+indexed output (skipped
    where pysam is absent)."""
    pysam = pytest.importorskip("pysam")
    from vireo_tpu.sim.pool_bam import pool_bams

    header = {"HD": {"VN": "1.6", "SO": "coordinate"},
              "SQ": [{"SN": "1", "LN": 1000}]}
    bam_path = str(tmp_path / "d0.bam")
    with pysam.AlignmentFile(bam_path, "wb", header=header) as f:
        for i, (bc, pos) in enumerate([("AAA", 99), ("AAA", 104),
                                       ("ZZZ", 99), ("AAA", 300)]):
            a = pysam.AlignedSegment()
            a.query_name = "r%d" % i
            a.query_sequence = "ACGT"
            a.reference_id = 0
            a.reference_start = pos
            a.cigarstring = "4M"
            a.flag = 0
            a.mapping_quality = 60
            a.set_tag("CB", bc)
            f.write(a)
    pysam.index(bam_path)

    vcf = _region_vcf(tmp_path, [("1", 101), ("1", 106)])
    rng = np.random.RandomState(0)
    out = pool_bams([bam_path], [["AAA"]], [1], str(tmp_path / "pp"),
                    doublet_rate=0.0, region_vcf=vcf, nproc=2, rng=rng)
    assert out.endswith(".sorted.bam")
    with pysam.AlignmentFile(out, "rb") as f:
        got = [(r.query_name, r.get_tag("CB"))
               for r in f.fetch(until_eof=True)]
    names = sorted(n for n, _ in got)
    assert names == ["r0", "r1"]                  # at SNPs, known BC
    assert all(t == "AAAS" for _, t in got)
