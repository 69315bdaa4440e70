#!/usr/bin/env bash
# Round-close gate: the three checks that must ALL be green before a
# round ends, run as one script so none can silently drift (the r6
# lesson: planlint regressed to 3 CartesianProduct flags at sf0.01
# without anyone noticing because the checks were run ad hoc).
#
#   1. full-registry oracle sweep at sf0.01 (writes CORRECTNESS_LOCAL.json)
#   2. plan lint at BOTH sf0.001 and sf0.01 — join-strategy choices are
#      size-estimate-dependent, so a plan clean at one SF can go
#      CartesianProduct at the other (exactly how r6's flags appeared)
#   3. sf1 scale rehearsal over the bench headline set
#
# Usage: bash tools/roundclose.sh [--skip-rehearsal]
# Exit nonzero on the first failing gate.
set -u
cd "$(dirname "$0")/.."

rc=0

echo "=== gate 1/3: full oracle sweep (sf0.01) ==="
python tools/check.py /root/testdata/sf0.01 || rc=1
if [ $rc -ne 0 ]; then echo "ROUNDCLOSE: check.py FAILED"; exit 1; fi

echo "=== canary: reference-parity layer (crawl goldens + misordered assembly) ==="
# A queries/-only round must not silently break operators/ or
# streaming/ (r7 VERDICT item 7): these two fixtures are the cheapest
# end-to-end exercise of the restrictor crawl (all reference edge
# cases) and the fragment-assembly state machine (the reference's own
# misordered-fragments fixture).
python -m pytest tests/test_flightdb_core.py -q -k "crawl" || rc=1
python -m pytest tests/test_assembly.py -q || rc=1
if [ $rc -ne 0 ]; then echo "ROUNDCLOSE: parity canary FAILED"; exit 1; fi

echo "=== gate 2/3: plan lint (sf0.001 + sf0.01) ==="
python tools/planlint.py /root/testdata/sf0.001 || rc=1
if [ $rc -ne 0 ]; then echo "ROUNDCLOSE: planlint sf0.001 FAILED"; exit 1; fi
python tools/planlint.py /root/testdata/sf0.01 || rc=1
if [ $rc -ne 0 ]; then echo "ROUNDCLOSE: planlint sf0.01 FAILED"; exit 1; fi

if [ "${1:-}" != "--skip-rehearsal" ]; then
  echo "=== gate 3/3: sf1 scale rehearsal ==="
  python tools/scale_rehearsal.py || rc=1
  if [ $rc -ne 0 ]; then echo "ROUNDCLOSE: scale rehearsal FAILED"; exit 1; fi
else
  echo "=== gate 3/3: SKIPPED (--skip-rehearsal) ==="
fi

echo "ROUNDCLOSE: all gates green"
