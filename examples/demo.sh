#!/bin/sh
# Demo: the five reference CLI modes on the bundled reference data
# (mirror of the reference examples/demo.sh against vireo-tpu).
# Usage: sh examples/demo.sh [DATA_DIR] [OUT_ROOT]

set -e
DATA=${1:-/root/reference/data}
OUT=${2:-/tmp/vireo_tpu_demo}
export PYTHONPATH="$(dirname "$0")/..:${PYTHONPATH}"
VIREO="python -m vireo_tpu.cli.vireo_cli"
GTBAR="python -m vireo_tpu.cli.gtbarcode_cli"

CELL_DIR=$DATA/cellSNP_mat
CELL_FILE=$DATA/cells.cellSNP.vcf.gz
DONOR_FILE=$DATA/donors.cellSNP.vcf.gz
DONOR_FILE_PART=$DATA/donors.two.cellSNP.vcf.gz

mkdir -p $OUT

## MODE 1: no donor genotype
$VIREO -c $CELL_DIR -N 4 -o $OUT/cellSNP_noGT --randSeed 2

## MODE 2: given donor genotype
$VIREO -c $CELL_FILE -d $DONOR_FILE -o $OUT/cellSNP_PL -N 4 --randSeed 2

## MODE 3: given partial donor genotype
$VIREO -c $CELL_FILE -d $DONOR_FILE_PART -o $OUT/cellSNP_part -N 4 --randSeed 2

## MODE 4: donor genotype as prior only
$VIREO -c $CELL_FILE -d $DONOR_FILE -o $OUT/cellSNP_learn --randSeed 2 -N 4 --forceLearnGT

## MODE 5: more donors in VCF than requested
$VIREO -c $CELL_FILE -d $DONOR_FILE -o $OUT/cellSNP_PL3 -N 3 --randSeed 2

## Genotype barcodes from the learned genotypes
$GTBAR -i $OUT/cellSNP_noGT/GT_donors.vireo.vcf.gz \
       -o $OUT/cellSNP_noGT/GT_barcodes.tsv --randSeed 1
