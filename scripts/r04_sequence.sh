#!/bin/bash
# Round-4 serialized TPU measurement sequence (one device client at a
# time).  Results land in EVIDENCE/ as they complete so partial
# progress survives; run from the repo root in the background.
# Usage: bash scripts/r04_sequence.sh [start_step]
set -u
cd "$(dirname "$0")/.."
mkdir -p EVIDENCE
START=${1:-1}

if [ "$START" -le 1 ]; then
echo "== [1/4] judged bench (warm) ==" >&2
timeout 5400 python bench.py 2>/tmp/seq_bench.log | tail -1 \
  | tee EVIDENCE/bench_r04_main.json >&2
fi

if [ "$START" -le 2 ]; then
echo "== [2/4] hg19-scale on-device alignment ==" >&2
timeout 14400 python scripts/hg19_align.py --workdir /root/hg19_work \
  2>/tmp/seq_hg19.log | tail -1 | tee BENCH_hg19_r04.json >&2
cp BENCH_hg19_r04.json EVIDENCE/hg19_align_r04.json 2>/dev/null
tail -6 /tmp/seq_hg19.log >&2
fi

if [ "$START" -le 3 ]; then
echo "== [3/4] compressor evidence at 1M reads ==" >&2
timeout 14400 python scripts/compressor_evidence.py 2>/tmp/seq_evid.log \
  | tail -1 | tee EVIDENCE/compressor_evidence_r04.json >&2
tail -8 /tmp/seq_evid.log >&2
fi

if [ "$START" -le 4 ]; then
echo "== [4/4] A/B sweeps ==" >&2
bash scripts/ab_r04.sh all
fi

echo "== r04 sequence complete ==" >&2
