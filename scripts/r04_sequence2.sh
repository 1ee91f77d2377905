#!/bin/bash
# Round-4 second measurement pass: A/B sweeps with the windowed-dedup
# defaults, compressor evidence, cap-tuned hg19 rerun, final bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p EVIDENCE
START=${1:-1}

if [ "$START" -le 1 ]; then
echo "== [1/5] seeding A/Bs ==" >&2
bash scripts/ab_r04.sh baseline_r4b 16384
bash scripts/ab_r04.sh bwd_win_off 16384 COMPSEED_BWD_WIN=0
bash scripts/ab_r04.sh fwd_memo_off 16384 COMPSEED_FWD_MEMO=0
bash scripts/ab_r04.sh chain_w6 16384 COMPSEED_CHAIN_W=6
bash scripts/ab_r04.sh r2_dedup_off 16384 COMPSEED_R2_DEDUP=0
bash scripts/ab_r04.sh chunk32k 32768
bash scripts/ab_r04.sh chunk64k 65536
fi

if [ "$START" -le 2 ]; then
echo "== [2/5] bench A/Bs ==" >&2
bash scripts/ab_r04.sh bench
fi

if [ "$START" -le 3 ]; then
echo "== [3/5] compressor evidence at 1M reads ==" >&2
timeout 14400 python scripts/compressor_evidence.py 2>/tmp/seq_evid.log \
  | tail -1 | tee EVIDENCE/compressor_evidence_r04.json >&2
tail -8 /tmp/seq_evid.log >&2
fi

if [ "$START" -le 4 ]; then
echo "== [4/5] hg19 rerun with caps sized for whole-genome volumes ==" >&2
COMPSEED_GP_F=72 COMPSEED_CAPU_F=48 COMPSEED_T2_F=16 COMPSEED_GP2_F=32 \
COMPSEED_MEM_F=16 COMPSEED_SEED_F=16 COMPSEED_U_F=12 \
timeout 14400 python scripts/hg19_align.py --workdir /root/hg19_work \
  2>/tmp/seq_hg19b.log | tail -1 | tee BENCH_hg19_r04.json >&2
cp BENCH_hg19_r04.json EVIDENCE/hg19_align_r04.json 2>/dev/null
tail -6 /tmp/seq_hg19b.log >&2
fi

if [ "$START" -le 5 ]; then
echo "== [5/5] final judged bench ==" >&2
timeout 5400 python bench.py 2>/tmp/seq_bench2.log | tail -1 \
  | tee EVIDENCE/bench_r04_main.json >&2
fi

echo "== r04 sequence2 complete ==" >&2
