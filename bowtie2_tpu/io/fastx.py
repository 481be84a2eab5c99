"""Host-side sequence file parsing: FASTA and FASTQ.

Counterpart of the reference's pat.h/pat.cpp parser family (FASTQ pat.h:771,
FASTA pat.h:556). The reference parses one lightly-locked batch at a time per
thread; here parsing is a host-side generator feeding fixed-shape padded
batches to the device pipeline (see bowtie2_tpu/io/batch.py).

Supports plain and gzip files (by extension / magic byte).
"""

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np

from bowtie2_tpu.constants import encode_seq


@dataclass
class SeqRecord:
    name: str
    seq: np.ndarray   # uint8 codes 0..4
    qual: np.ndarray  # uint8 phred scores (0..41+); 40s if FASTA


def _open_text(path: str):
    f = open(path, "rb")
    if f.seekable():
        magic = f.read(2)
        f.seek(0)
        if magic == b"\x1f\x8b":
            return io.BufferedReader(gzip.GzipFile(fileobj=f))
        return f
    if path.endswith(".gz"):
        return io.BufferedReader(gzip.GzipFile(fileobj=f))
    return io.BufferedReader(f)  # pipe/FIFO: rely on extension for gzip


def read_fasta(path: str, _fh=None) -> List[Tuple[str, np.ndarray]]:
    """Parse FASTA → [(name, codes uint8 incl N)]. Name is first whitespace token."""
    out = []
    name = None
    chunks: List[bytes] = []
    with (_fh or _open_text(path)) as f:
        for line in f:
            line = line.rstrip(b"\r\n")
            if line.startswith(b">"):
                if name is not None:
                    out.append((name, encode_seq(b"".join(chunks))))
                name = line[1:].split()[0].decode() if len(line) > 1 else ""
                chunks = []
            elif line:
                chunks.append(line)
    if name is not None:
        out.append((name, encode_seq(b"".join(chunks))))
    return out


def iter_fastq(path: str, qual_offset: int = 33, _fh=None) -> Iterator[SeqRecord]:
    """Stream FASTQ records. Phred+33 by default (--phred64 → 64)."""
    with (_fh or _open_text(path)) as f:
        while True:
            h = f.readline()
            if not h:
                return
            h = h.rstrip(b"\r\n")
            if not h:
                continue
            if not h.startswith(b"@"):
                raise ValueError(f"bad FASTQ header line: {h[:50]!r}")
            seq = f.readline().rstrip(b"\r\n")
            plus = f.readline()
            qual = f.readline().rstrip(b"\r\n")
            if not plus.startswith(b"+") or len(qual) != len(seq):
                raise ValueError(f"malformed FASTQ record {h[:50]!r}")
            q = np.frombuffer(qual, dtype=np.uint8).astype(np.int16) - qual_offset
            yield SeqRecord(
                name=h[1:].split()[0].decode(),
                seq=encode_seq(seq),
                qual=np.clip(q, 0, 62).astype(np.uint8),
            )


def iter_fasta_reads(path: str, _fh=None) -> Iterator[SeqRecord]:
    """FASTA as reads: qualities fixed at 40 (reference uses Phred 40 / 'I')."""
    for name, codes in read_fasta(path, _fh=_fh):
        yield SeqRecord(name=name, seq=codes, qual=np.full(codes.size, 40, np.uint8))


def iter_reads(path: str, fmt: str = "auto", qual_offset: int = 33) -> Iterator[SeqRecord]:
    if fmt == "auto":
        f = _open_text(path)
        buffered = f if isinstance(f, io.BufferedReader) else io.BufferedReader(f)
        first = buffered.peek(1)[:1]
        fmt = "fasta" if first == b">" else "fastq"
        if fmt == "fasta":
            return iter_fasta_reads(path, _fh=buffered)
        return iter_fastq(path, qual_offset, _fh=buffered)
    if fmt == "fasta":
        return iter_fasta_reads(path)
    return iter_fastq(path, qual_offset)
