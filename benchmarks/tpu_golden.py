"""TPU-native golden verification.

Runs the demo CLI configurations (the five reference modes of
examples/demo.sh plus the ambient / ASE / cellRange flag variants and
GTbarcode) on the REAL TPU in the f32 production configuration, and
compares the discrete outputs — the donor/doublet/unassigned calls of
`donor_ids.tsv` and the `GT_barcodes.tsv` variant set — against the
committed goldens (tests/goldens/, generated from the CPU reference
implementation at the same seeds; reference demo:
/root/reference/examples/demo.sh:14-41).

The CPU test suite proves bit-parity on the x64 host path; this script
is the recorded evidence that the f32 TPU path reproduces the same
discrete calls. Writes benchmarks/tpu_golden.json.

Usage: python benchmarks/tpu_golden.py          (tunnel TPU)
       VIREO_PLATFORM=cpu python ... (sanity run on host)
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DATA = "/root/reference/data"
GOLD = os.path.join(REPO, "tests", "goldens")

MODES = [
    ("mode1", ["-c", DATA + "/cellSNP_mat", "-N", "4"], []),
    ("mode2", ["-c", DATA + "/cells.cellSNP.vcf.gz",
               "-d", DATA + "/donors.cellSNP.vcf.gz", "-N", "4"], []),
    ("mode3", ["-c", DATA + "/cells.cellSNP.vcf.gz",
               "-d", DATA + "/donors.two.cellSNP.vcf.gz", "-N", "4"], []),
    ("mode4", ["-c", DATA + "/cells.cellSNP.vcf.gz",
               "-d", DATA + "/donors.cellSNP.vcf.gz", "-N", "4",
               "--forceLearnGT"], []),
    ("mode5", ["-c", DATA + "/cells.cellSNP.vcf.gz",
               "-d", DATA + "/donors.cellSNP.vcf.gz", "-N", "3"], []),
    ("ambient", ["-c", DATA + "/cellSNP_mat", "-N", "4",
                 "--callAmbientRNAs"], []),
    ("ase", ["-c", DATA + "/cellSNP_mat", "-N", "4", "--ASEmode"], []),
    ("cellrange", ["-c", DATA + "/cellSNP_mat", "-N", "4",
                   "--cellRange", "100-600"], []),
]


def _env():
    env = dict(os.environ)
    env.setdefault("VIREO_COMPILE_CACHE", os.path.join(REPO, ".jax_cache"))
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    return env


def _compare_calls(got_path, golden_path):
    """(n_rows, n_diff) over the discrete call column of donor_ids.tsv."""
    with open(got_path) as f:
        got = [line.split("\t")[1] for line in f.read().splitlines()[1:]]
    with open(golden_path) as f:
        want = [line.split("\t")[1] for line in f.read().splitlines()[1:]]
    assert len(got) == len(want), (
        "row count mismatch: %d vs %d" % (len(got), len(want)))
    n_diff = sum(g != w for g, w in zip(got, want))
    return len(got), n_diff


def main():
    out_root = os.environ.get("TPU_GOLDEN_OUT", "/tmp/vireo_tpu_golden")
    results = {}
    all_match = True

    for name, flags, extra in MODES:
        golden = os.path.join(GOLD, "donor_ids_%s.tsv" % name)
        out_dir = os.path.join(out_root, name)
        cmd = [sys.executable, "-m", "vireo_tpu.cli.vireo_cli",
               "-o", out_dir, "--randSeed", "2"] + flags + extra
        t0 = time.time()
        proc = subprocess.run(cmd, env=_env(), capture_output=True,
                              text=True)
        dt = time.time() - t0
        if proc.returncode != 0:
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            results[name] = {"error": "exit %d" % proc.returncode,
                             "seconds": round(dt, 1)}
            all_match = False
            continue
        n, n_diff = _compare_calls(os.path.join(out_dir, "donor_ids.tsv"),
                                   golden)
        match = n_diff == 0
        all_match &= match
        results[name] = {"n_cells": n, "n_diff": n_diff, "match": match,
                         "seconds": round(dt, 1)}
        print("[tpu_golden] %-10s %4d cells, %d diffs, %.1fs %s"
              % (name, n, n_diff, dt, "OK" if match else "MISMATCH"))

    # GTbarcode on the reference's learned-GT VCF (the golden's input)
    out_dir = os.path.join(out_root, "gtbarcode")
    os.makedirs(out_dir, exist_ok=True)
    bar_out = os.path.join(out_dir, "GT_barcodes.tsv")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "vireo_tpu.cli.gtbarcode_cli",
         "-i", os.path.join(GOLD, "GT_donors.ref.vcf.gz"),
         "-o", bar_out, "--randSeed", "1", "--noPlot"],
        env=_env(), capture_output=True, text=True)
    dt = time.time() - t0
    with open(bar_out) as f, open(os.path.join(GOLD,
                                               "GT_barcodes.tsv")) as g:
        match = f.read() == g.read()
    all_match &= match
    results["gtbarcode"] = {"match": match, "seconds": round(dt, 1)}
    print("[tpu_golden] gtbarcode %s (%.1fs)"
          % ("OK" if match else "MISMATCH", dt))

    # record the platform the runs actually used
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; d=jax.devices()[0]; "
         "print(jax.default_backend(), d.device_kind)"],
        env=_env(), capture_output=True, text=True)
    platform = probe.stdout.strip() or "unknown"

    payload = {"platform": platform, "dtype": "float32",
               "all_match": all_match, "runs": results}
    path = os.path.join(HERE, "tpu_golden.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print("[tpu_golden] %s -> %s" % ("ALL MATCH" if all_match
                                     else "MISMATCHES PRESENT", path))
    return 0 if all_match else 1


if __name__ == "__main__":
    sys.exit(main())
