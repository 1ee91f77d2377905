"""Generate deterministic test fixtures.

Creates a small genome, simulated reads (plain + compressor-reordered
order), builds the index with the *reference* bwaidx binary when available
(.ref_build/), and records golden SAM from the reference bwamem/CompSeed
binaries.  The committed fixtures make the differential test-suite
self-contained; this script documents their provenance.

Run:  python scripts/make_fixtures.py
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(ROOT, "tests", "fixtures")
REF_BUILD = os.path.join(ROOT, ".ref_build")

GENOME_LEN = 50_000
GENOME2_LEN = 20_000
N_READS = 2_000
READ_LEN = 101
ERR_RATE = 0.01


def make_genome(path: str) -> tuple[str, str]:
    rng = np.random.default_rng(42)
    bases = np.array(list("ACGT"))
    seq = "".join(rng.choice(bases, size=GENOME_LEN))
    seq = seq[:1000] + "NNNNN" + seq[1000:2000] + "N" + seq[2000:]
    # a tandem-ish repeat region to exercise re-seeding / repetitive logic
    rep_unit = seq[30000:30100]
    seq = seq[:35000] + rep_unit * 8 + seq[35000:]
    seq2 = "".join(rng.choice(bases, size=GENOME2_LEN))
    with open(path, "w") as f:
        f.write(">tiny_chr1 test contig\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i: i + 70] + "\n")
        f.write(">tiny_chr2\n")
        for i in range(0, len(seq2), 70):
            f.write(seq2[i: i + 70] + "\n")
    return seq, seq2


COMP = str.maketrans("ACGTN", "TGCAN")


def simulate_reads(seq: str, seq2: str):
    rng = np.random.default_rng(7)
    contigs = [seq, seq2]
    reads = []
    for i in range(N_READS):
        ci = int(rng.integers(0, 2))
        s = contigs[ci]
        pos = int(rng.integers(0, len(s) - READ_LEN))
        r = s[pos: pos + READ_LEN]
        if rng.random() < 0.5:
            r = r.translate(COMP)[::-1]
        rl = list(r)
        # substitution errors
        for j in range(READ_LEN):
            if rng.random() < ERR_RATE:
                rl[j] = "ACGT"[int(rng.integers(0, 4))]
        # occasional short indel
        if rng.random() < 0.05:
            j = int(rng.integers(10, READ_LEN - 10))
            if rng.random() < 0.5:
                del rl[j: j + int(rng.integers(1, 4))]
            else:
                rl[j:j] = ["ACGT"[int(rng.integers(0, 4))]
                           for _ in range(int(rng.integers(1, 4)))]
        # a few reads with Ns
        if rng.random() < 0.02:
            j = int(rng.integers(0, len(rl)))
            rl[j] = "N"
        reads.append("".join(rl))
    return reads


def simulate_pairs(seq: str, seq2: str, n_pairs: int = 800):
    """Proper FR pairs, insert ~350 +/- 40, plus a few discordant ones."""
    rng = np.random.default_rng(99)
    contigs = [seq, seq2]
    pairs = []
    for i in range(n_pairs):
        ci = int(rng.integers(0, 2))
        s = contigs[ci]
        if rng.random() < 0.03:  # discordant / distant pair
            isize = int(rng.integers(3000, 8000))
        else:
            isize = int(rng.normal(350, 40))
        isize = max(READ_LEN + 10, min(isize, len(s) - 10))
        pos = int(rng.integers(0, len(s) - isize))
        r1 = s[pos: pos + READ_LEN]
        r2 = s[pos + isize - READ_LEN: pos + isize]
        r2 = r2.translate(COMP)[::-1]
        out = []
        for r in (r1, r2):
            rl = list(r)
            for j in range(READ_LEN):
                if rng.random() < ERR_RATE:
                    rl[j] = "ACGT"[int(rng.integers(0, 4))]
            out.append("".join(rl))
        if rng.random() < 0.5:  # read1/read2 strand swap
            out = [out[1].translate(COMP)[::-1], out[0].translate(COMP)[::-1]]
        pairs.append(out)
    return pairs


def make_alt_fixture() -> None:
    """Genome with an ALT contig: ``pchr_alt`` is a mutated copy of a
    primary slice, so reads from that region align to both and exercise
    the ALT branches (is_alt mapq/XA/XR, ALT supplementary, -j).
    The ``.alt`` file is the SAM-ish name list bns_restore consumes
    (FM_index/bntseq.c:178-209)."""
    rng = np.random.default_rng(555)
    bases = np.array(list("ACGT"))
    primary = "".join(rng.choice(bases, size=30_000))
    alt = list(primary[10_000:16_000])
    for j in range(len(alt)):           # ~0.5% divergence
        if rng.random() < 0.005:
            alt[j] = "ACGT"[int(rng.integers(0, 4))]
    alt = "".join(alt)
    fa = os.path.join(FIX, "tiny_alt.fa")
    with open(fa, "w") as f:
        for name, s in (("pchr", primary), ("pchr_alt", alt)):
            f.write(f">{name}\n")
            for i in range(0, len(s), 70):
                f.write(s[i: i + 70] + "\n")
    with open(os.path.join(FIX, "tiny_alt.alt"), "w") as f:
        f.write("@SQ\tSN:pchr_alt\tLN:6000\n")    # '@' lines are skipped
        f.write("pchr_alt\t4\tpchr\t10001\t255\t6000M\t*\t0\t0\t*\t*\n")

    contigs = [primary, alt]
    reads = []
    for i in range(600):
        src = contigs[int(rng.integers(0, 2))]
        # bias onto the duplicated region so ALT logic actually fires
        if src is primary and rng.random() < 0.7:
            pos = int(rng.integers(9_500, 16_500 - READ_LEN))
        else:
            pos = int(rng.integers(0, len(src) - READ_LEN))
        r = src[pos: pos + READ_LEN]
        if rng.random() < 0.5:
            r = r.translate(COMP)[::-1]
        rl = list(r)
        for j in range(READ_LEN):
            if rng.random() < ERR_RATE:
                rl[j] = "ACGT"[int(rng.integers(0, 4))]
        reads.append("".join(rl))
    with open(os.path.join(FIX, "reads_alt.fq"), "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@alt{i}\n{r}\n+\n{'I' * len(r)}\n")
    pairs = []
    for i in range(250):
        src = contigs[int(rng.integers(0, 2))]
        isize = max(READ_LEN + 10, int(rng.normal(300, 30)))
        if src is primary and rng.random() < 0.7:
            pos = int(rng.integers(9_500, 16_500 - isize))
        else:
            pos = int(rng.integers(0, len(src) - isize))
        r1 = src[pos: pos + READ_LEN]
        r2 = src[pos + isize - READ_LEN: pos + isize].translate(COMP)[::-1]
        pairs.append((r1, r2))
    with open(os.path.join(FIX, "reads_alt_1.fq"), "w") as f1, \
            open(os.path.join(FIX, "reads_alt_2.fq"), "w") as f2:
        for i, (r1, r2) in enumerate(pairs):
            f1.write(f"@ap{i}/1\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@ap{i}/2\n{r2}\n+\n{'I' * len(r2)}\n")

    bwaidx = os.path.join(REF_BUILD, "bwaidx")
    bwamem = os.path.join(REF_BUILD, "bwamem")
    if not (os.path.exists(bwaidx) and os.path.exists(bwamem)):
        print("reference binaries not found; ALT goldens not regenerated",
              file=sys.stderr)
        return
    subprocess.run([bwaidx, "-p", os.path.join(FIX, "tiny_alt"), fa],
                   check=True, capture_output=True)
    runs = [
        (["%s" % bwamem, os.path.join(FIX, "tiny_alt"),
          os.path.join(FIX, "reads_alt.fq")], "golden_alt_se.sam"),
        ([bwamem, "-j", os.path.join(FIX, "tiny_alt"),
          os.path.join(FIX, "reads_alt.fq")], "golden_alt_j.sam"),
        ([bwamem, os.path.join(FIX, "tiny_alt"),
          os.path.join(FIX, "reads_alt_1.fq"),
          os.path.join(FIX, "reads_alt_2.fq")], "golden_alt_pe.sam"),
    ]
    for cmd, out in runs:
        r = subprocess.run(cmd, check=True, capture_output=True)
        lines = [l for l in r.stdout.decode().splitlines(keepends=True)
                 if not l.startswith("@PG")]
        with open(os.path.join(FIX, out), "w") as f:
            f.writelines(lines)
        print("wrote", out, len(lines), "lines")


def main() -> None:
    os.makedirs(FIX, exist_ok=True)
    fa = os.path.join(FIX, "tiny.fa")
    seq, seq2 = make_genome(fa)
    reads = simulate_reads(seq, seq2)
    pairs = simulate_pairs(seq, seq2)
    with open(os.path.join(FIX, "reads_1.fq"), "w") as f1, \
            open(os.path.join(FIX, "reads_2.fq"), "w") as f2:
        for i, (r1, r2) in enumerate(pairs):
            f1.write(f"@pair{i}/1\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@pair{i}/2\n{r2}\n+\n{'I' * len(r2)}\n")

    with open(os.path.join(FIX, "reads.fq"), "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@read{i}\n{r}\n+\n{'I' * len(r)}\n")

    # mixed interleaved smart-PE input (-p): adjacent same-name records
    # are pairs, the rest are orphans (bseq_classify, bwalib/bwa.c:113-129)
    rngm = np.random.default_rng(123)
    with open(os.path.join(FIX, "reads_mixed.fq"), "w") as f:
        se_i = 0
        for i, (r1, r2) in enumerate(pairs[:400]):
            if rngm.random() < 0.25 and se_i < len(reads):
                r = reads[se_i]
                f.write(f"@orphan{se_i}\n{r}\n+\n{'I' * len(r)}\n")
                se_i += 1
            f.write(f"@pair{i}/1\n{r1}\n+\n{'I' * len(r1)}\n")
            f.write(f"@pair{i}/2\n{r2}\n+\n{'I' * len(r2)}\n")
    # compressor-reordered raw format: one sequence per line, sorted so
    # similar reads are adjacent (what SPRING/Minicom/PgRC reordering does)
    with open(os.path.join(FIX, "reads.reordered"), "w") as f:
        for r in sorted(reads):
            f.write(r + "\n")

    bwaidx = os.path.join(REF_BUILD, "bwaidx")
    if os.path.exists(bwaidx):
        subprocess.run([bwaidx, "-p", os.path.join(FIX, "tiny"), fa],
                       check=True, capture_output=True)
        bwamem = os.path.join(REF_BUILD, "bwamem")
        compseed = os.path.join(REF_BUILD, "CompSeed")
        for binary, inp, out in [
            (bwamem, "reads.fq", "golden_bwamem.sam"),
            (compseed, "reads.fq", "golden_compseed_fq.sam"),
            (compseed, "reads.reordered", "golden_compseed_reordered.sam"),
        ]:
            if not os.path.exists(binary):
                continue
            r = subprocess.run(
                [binary, os.path.join(FIX, "tiny"), os.path.join(FIX, inp)],
                check=True, capture_output=True)
            # drop @PG line (tool-specific)
            lines = [l for l in r.stdout.decode().splitlines(keepends=True)
                     if not l.startswith("@PG")]
            with open(os.path.join(FIX, out), "w") as f:
                f.writelines(lines)
            print("wrote", out, len(lines), "lines")
        # paired-end golden (bwamem is the PE oracle; CompSeed is SE-only)
        r = subprocess.run(
            [bwamem, os.path.join(FIX, "tiny"),
             os.path.join(FIX, "reads_1.fq"), os.path.join(FIX, "reads_2.fq")],
            check=True, capture_output=True)
        lines = [l for l in r.stdout.decode().splitlines(keepends=True)
                 if not l.startswith("@PG")]
        with open(os.path.join(FIX, "golden_bwamem_pe.sam"), "w") as f:
            f.writelines(lines)
        print("wrote golden_bwamem_pe.sam", len(lines), "lines")
        # smart-PE golden: bwamem -p over the mixed interleaved input
        r = subprocess.run(
            [bwamem, "-p", os.path.join(FIX, "tiny"),
             os.path.join(FIX, "reads_mixed.fq")],
            check=True, capture_output=True)
        lines = [l for l in r.stdout.decode().splitlines(keepends=True)
                 if not l.startswith("@PG")]
        with open(os.path.join(FIX, "golden_bwamem_smartpe.sam"), "w") as f:
            f.writelines(lines)
        print("wrote golden_bwamem_smartpe.sam", len(lines), "lines")
    else:
        print("reference binaries not found; goldens not regenerated",
              file=sys.stderr)
    make_alt_fixture()
    print("fixtures in", FIX)


if __name__ == "__main__":
    main()
