"""Input-format parsers (reference pat.h format family)."""

import gzip
import struct
import zlib

import numpy as np

from bowtie2_tpu.io.fastx import (iter_bam, iter_interleaved, iter_qseq,
                                  iter_raw, iter_reads, iter_tab, trim_record)


def _bgzf(data):
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 25 + 6
    hdr = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
           + struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize - 1))
    return hdr + comp + struct.pack("<II", zlib.crc32(data), len(data))


def test_bam_reader(tmp_path):
    body = b"BAM\x01" + struct.pack("<i", 3) + b"@HD" + struct.pack("<i", 1)
    body += struct.pack("<i", 4) + b"ref\x00" + struct.pack("<i", 1000)

    def rec(name, seq, qual, flag=4):
        enc = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}
        sb = bytearray()
        for i in range(0, len(seq), 2):
            hi = enc[seq[i]] << 4
            lo = enc[seq[i + 1]] if i + 1 < len(seq) else 0
            sb.append(hi | lo)
        d = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0,
                        flag, len(seq), -1, -1, 0)
        d += name.encode() + b"\x00" + bytes(sb)
        d += bytes(q - 33 for q in qual.encode())
        return struct.pack("<i", len(d)) + d

    body += rec("a", "ACGTNACG", "IIIIIIII")
    body += rec("b", "TTTTACGT", "!!!!IIII", flag=4 | 0x10)
    body += rec("sec", "ACGT", "IIII", flag=0x100)   # skipped
    p = tmp_path / "t.bam"
    p.write_bytes(_bgzf(body) + _bgzf(b""))
    recs = list(iter_bam(str(p)))
    assert [r.name for r in recs] == ["a", "b"]
    assert recs[0].seq.tolist() == [0, 1, 2, 3, 4, 0, 1, 2]
    assert recs[1].seq.tolist() == [0, 1, 2, 3, 0, 0, 0, 0]  # un-revcomped


def test_bam_preserve_tags(tmp_path):
    body = b"BAM\x01" + struct.pack("<i", 3) + b"@HD" + struct.pack("<i", 1)
    body += struct.pack("<i", 4) + b"ref\x00" + struct.pack("<i", 1000)
    aux = (b"RGZgrp1\x00"                     # RG:Z:grp1
           + b"NMC\x05"                       # NM:C:5 -> NM:i:5
           + b"XSs" + struct.pack("<h", -7)   # XS:s:-7 -> XS:i:-7
           + b"BCBc" + struct.pack("<i", 3) + struct.pack("<3b", 1, -2, 3))
    seq, qual, name = "ACGT", "IIII", "t"
    enc = {"A": 1, "C": 2, "G": 4, "T": 8, "N": 15}
    sb = bytes([enc[seq[0]] << 4 | enc[seq[1]],
                enc[seq[2]] << 4 | enc[seq[3]]])
    d = struct.pack("<iiBBHHHiiii", -1, -1, len(name) + 1, 0, 0, 0,
                    4, len(seq), -1, -1, 0)
    d += name.encode() + b"\x00" + sb
    d += bytes(q - 33 for q in qual.encode())
    d += aux
    body += struct.pack("<i", len(d)) + d
    p = tmp_path / "t.bam"
    p.write_bytes(_bgzf(body) + _bgzf(b""))
    (r,) = list(iter_bam(str(p), preserve_tags=True))
    assert r.tags == "\tRG:Z:grp1\tNM:i:5\tXS:i:-7\tBC:B:c,1,-2,3"
    (r2,) = list(iter_bam(str(p)))
    assert r2.tags is None


def test_qseq_reader(tmp_path):
    p = tmp_path / "t.qseq"
    p.write_bytes(b"M1\t42\t1\t1\t100\t200\t0\t1\tACG.T\tabcde\t1\n")
    r = list(iter_qseq(str(p)))[0]
    assert r.name == "M1_42_1_1_100_200"
    assert r.seq.tolist() == [0, 1, 2, 4, 3]
    assert r.qual.tolist() == [ord(c) - 64 for c in "abcde"]


def test_raw_tab_interleaved_trim(tmp_path):
    (tmp_path / "r.txt").write_bytes(b"ACGT\nTTAA\n")
    rs = list(iter_raw(str(tmp_path / "r.txt")))
    assert [r.name for r in rs] == ["0", "1"]
    (tmp_path / "t6.tab").write_bytes(
        b"p1\tACGT\tIIII\tp1b\tTTTT\tIIII\n")
    (r1, r2) = list(iter_tab(str(tmp_path / "t6.tab")))[0]
    assert r1.name == "p1" and r2.name == "p1b"
    (tmp_path / "il.fq").write_bytes(
        b"@x/1\nACGT\n+\nIIII\n@x/2\nTTTT\n+\nIIII\n")
    pairs = list(iter_interleaved(str(tmp_path / "il.fq")))
    assert len(pairs) == 1
    t = trim_record(r1, 1, 1)
    assert t.seq.tolist() == [1, 2]
