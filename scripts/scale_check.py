"""Mid-scale end-to-end parity drive (not part of the CI suite: ~2 min).

Builds a 20 Mbp random genome, byte-compares our index against the
reference bwaidx, aligns 20k simulated reads with the device engine and
byte-compares the SAM against the reference bwamem — the same
differential contract as the fixture tests, at a scale where the int32
device paths, the SA-IS builder and the chunked CLI all do real work.

Run:  python scripts/scale_check.py        (needs .ref_build/ binaries)
Last verified: 2026-08-16, 20,000/20,000 records identical on TPU.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
REF = os.path.join(ROOT, ".ref_build")


def main() -> int:
    from compseed_tpu.utils import NT4_TO_ASCII

    tmp = tempfile.mkdtemp(prefix="compseed_scale_")
    fa = os.path.join(tmp, "g.fa")
    rng = np.random.default_rng(5)
    seq = rng.integers(0, 4, 20_000_000).astype(np.uint8)
    with open(fa, "w") as f:
        f.write(">big_chr mid-scale test\n")
        s = bytes(NT4_TO_ASCII[seq]).decode()
        for i in range(0, len(s), 80):
            f.write(s[i:i + 80] + "\n")

    subprocess.run([os.path.join(REF, "bwaidx"), "-p",
                    os.path.join(tmp, "ref"), fa], check=True,
                   capture_output=True)
    from compseed_tpu.index import build_index
    from compseed_tpu.index.io import save_index
    save_index(os.path.join(tmp, "mine"), build_index(fa))
    for ext in (".pac", ".ann", ".amb", ".bwt", ".sa"):
        a = open(os.path.join(tmp, "ref" + ext), "rb").read()
        b = open(os.path.join(tmp, "mine" + ext), "rb").read()
        assert a == b, f"index {ext} differs"
    print("index parity OK (20 Mbp)")

    genome = bytes(NT4_TO_ASCII[seq]).decode()
    comp = str.maketrans("ACGT", "TGCA")
    fq = os.path.join(tmp, "reads.fq")
    rng = np.random.default_rng(77)
    with open(fq, "w") as f:
        for i in range(20_000):
            p = int(rng.integers(0, len(genome) - 101))
            r = genome[p:p + 101]
            if rng.random() < 0.5:
                r = r.translate(comp)[::-1]
            rl = list(r)
            for j in range(101):
                if rng.random() < 0.01:
                    rl[j] = "ACGT"[int(rng.integers(0, 4))]
            f.write(f"@r{i}\n{''.join(rl)}\n+\n{'I' * 101}\n")

    gold = subprocess.run([os.path.join(REF, "bwamem"),
                           os.path.join(tmp, "ref"), fq],
                          check=True, capture_output=True)
    out = os.path.join(tmp, "mine.sam")
    subprocess.run([sys.executable, "-m", "compseed_tpu.cli", "mem",
                    os.path.join(tmp, "mine"), fq,
                    "--engine", "device", "--tail", "native",
                    "-o", out], check=True, cwd=ROOT)
    mine = [l for l in open(out) if not l.startswith("@")]
    goldl = [l for l in gold.stdout.decode().splitlines(keepends=True)
             if not (l.startswith("@"))]
    assert len(mine) == len(goldl), (len(mine), len(goldl))
    bad = sum(m != g for m, g in zip(mine, goldl))
    assert bad == 0, f"{bad} SAM records differ"
    print(f"alignment parity OK ({len(mine)} records)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
