"""Read-batch input: FASTQ and compressor-reordered raw lines.

Contracts: bseq_read (bwalib/bwa.c:78-111) — chunking by base count with
name /1 /2 trimming; input_reorder_reads (main.cpp:36-58) — one sequence
per line, names are running integers starting at 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator


@dataclass
class Read:
    name: str
    seq: str
    qual: str | None
    comment: str | None
    sam: str | None = None


def _opener(path: str):
    """Transparent open: plain/gzip file, '-' stdin, '<cmd' pipe, http://
    and ftp:// URLs (kopen semantics, bwalib/kopen.c:268-336)."""
    from compseed_tpu.io.kopen import kopen_text

    return kopen_text(path)


def _trim_readno(name: str) -> str:
    if len(name) > 2 and name[-2] == "/" and name[-1].isdigit():
        return name[:-2]
    return name


def read_fastq_chunks(path: str, chunk_size: int) -> Iterator[list[Read]]:
    """Yield chunks of reads totalling >= chunk_size bases (even count)."""
    f = _opener(path)
    batch: list[Read] = []
    size = 0
    while True:
        hdr = f.readline()
        if not hdr:
            break
        hdr = hdr.rstrip("\n")
        if hdr.startswith("@"):
            parts = hdr[1:].split(None, 1)
            name = _trim_readno(parts[0])
            comment = parts[1] if len(parts) > 1 else None
            seq = f.readline().strip()
            plus = f.readline()
            qual = f.readline().strip() if plus.startswith("+") else None
        elif hdr.startswith(">"):
            parts = hdr[1:].split(None, 1)
            name = _trim_readno(parts[0])
            comment = parts[1] if len(parts) > 1 else None
            seq = f.readline().strip()
            qual = None
        else:
            continue
        batch.append(Read(name=name, seq=seq, qual=qual, comment=comment))
        size += len(seq)
        if size >= chunk_size and len(batch) % 2 == 0:
            yield batch
            batch, size = [], 0
    if batch:
        yield batch
    f.close()


def read_reordered_chunks(path: str, chunk_size: int) -> Iterator[list[Read]]:
    """Raw reordered reads: one sequence per line, integer names from 1."""
    f = _opener(path)
    batch: list[Read] = []
    size = 0
    counter = 1
    for line in f:
        seq = line.rstrip("\n")
        if not seq:
            continue
        batch.append(Read(name=str(counter), seq=seq, qual=None, comment=None))
        counter += 1
        size += len(seq)
        if size >= chunk_size and len(batch) % 2 == 0:
            yield batch
            batch, size = [], 0
    if batch:
        yield batch
    f.close()


def sniff_is_fastq(path: str) -> bool:
    """main.cpp:399-406: first character '@' selects FASTQ parsing."""
    if path == "-":
        return True
    f = _opener(path)
    first = f.read(1)
    f.close()
    return first == "@"


def read_fastq_pair_chunks(path1: str, path2: str,
                           chunk_size: int) -> Iterator[list[Read]]:
    """Interleave two FASTQ files pairwise (bseq_read with two kseq
    streams, bwalib/bwa.c:90-99); chunk boundaries stay on pair edges."""
    g1 = read_fastq_chunks(path1, 1)   # chunk of one pair at a time
    g2 = read_fastq_chunks(path2, 1)
    batch: list[Read] = []
    size = 0
    while True:
        r1 = next(g1, None)
        r2 = next(g2, None)
        if r1 is None or r2 is None:
            break
        for a, b in zip(r1, r2):
            batch.extend((a, b))
            size += len(a.seq) + len(b.seq)
        if size >= chunk_size:
            yield batch
            batch, size = [], 0
    if batch:
        yield batch
