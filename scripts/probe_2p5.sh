#!/usr/bin/env bash
# Evidence-in-tree for the --2p5 descent-engine scope decision (VERDICT r4 #9).
#
# The reference's experimental descent engine (aligner_seed2.h:143-2528,
# aligner_driver.h:182, enabled by `--test-25`) HANGS in the 2.5.5 release
# on a single exact 26 bp lambda read that the default engine answers in
# milliseconds. With no working oracle there is nothing to differentially
# validate a reimplementation against — this script captures that hang.
#
# Usage: scripts/probe_2p5.sh [REFBIN_DIR] [TIMEOUT_S]
# Writes the captured log next to this script as probe_2p5.log.
set -u
REFBIN="${1:-/root/repo/.ref_build}"
TO="${2:-90}"
HERE="$(cd "$(dirname "$0")" && pwd)"
LOG="$HERE/probe_2p5.log"
LAMBDA=/root/reference/example/reference/lambda_virus.fa
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

{
  echo "# --test-25 dead-oracle probe, $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# binary: $REFBIN/bowtie2-align-s ($($REFBIN/bowtie2-align-s --version 2>/dev/null | head -1))"
} > "$LOG"

cd "$TMP"
"$REFBIN/bowtie2-build-s" "$LAMBDA" lam > /dev/null 2>&1
# exact 26 bp substring of lambda (positions 1000-1025)
READ=$(awk 'NR>1' "$LAMBDA" | tr -d '\n' | cut -c1001-1026)
printf '@r1\n%s\n+\n%s\n' "$READ" "IIIIIIIIIIIIIIIIIIIIIIIIII" > r.fq

for PRESET in --sensitive --very-fast; do
  echo "## default engine, $PRESET" >> "$LOG"
  T0=$(date +%s.%N)
  timeout "$TO" \
    "$REFBIN/bowtie2-align-s" $PRESET -x lam -U r.fq --quiet -S def.sam \
    >> "$LOG" 2>&1
  echo "elapsed $(echo "$(date +%s.%N) - $T0" | bc)s" >> "$LOG"
  grep -v '^@' def.sam | cut -f1-6 >> "$LOG" 2>/dev/null || true

  echo "## --test-25 descent engine, $PRESET (timeout ${TO}s)" >> "$LOG"
  T0=$(date +%s.%N)
  timeout "$TO" \
    "$REFBIN/bowtie2-align-s" $PRESET --test-25 -x lam -U r.fq --quiet \
    -S d25.sam >> "$LOG" 2>&1
  RC=$?
  echo "elapsed $(echo "$(date +%s.%N) - $T0" | bc)s" >> "$LOG"
  if [ $RC -eq 124 ]; then
    echo "RESULT: --test-25 HUNG (killed by timeout after ${TO}s)" >> "$LOG"
  else
    echo "RESULT: --test-25 exited rc=$RC" >> "$LOG"
    grep -v '^@' d25.sam | cut -f1-6 >> "$LOG" 2>/dev/null || true
  fi
done
echo "wrote $LOG"
cat "$LOG"
