#!/usr/bin/env python3
"""Independent oracle for f55_bam_flagstat: parse the reference BAM
fixture's flags with Python's gzip (BGZF is concatenated gzip members)
and raw struct unpacking — no graft code, no htsjdk — and print the
samtools-flagstat-shaped counts pinned into FormatQueries.oracles.
"""
import gzip
import struct
import sys

PATH = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/exon/exon-core/test-data/datasources/bam/test.bam"

f = gzip.open(PATH, "rb")


def u32():
    return struct.unpack("<i", f.read(4))[0]


assert f.read(4) == b"BAM\x01"
f.read(u32())          # header text
for _ in range(u32()):  # reference dictionary
    f.read(u32())
    u32()
flags = []
while True:
    b = f.read(4)
    if len(b) < 4:
        break
    rec = f.read(struct.unpack("<i", b)[0])
    flags.append(struct.unpack("<H", rec[14:16])[0])


def c(mask, invert=False):
    return sum(1 for x in flags if bool(x & mask) != invert)


stats = [
    ("total", len(flags)), ("mapped", c(4, invert=True)),
    ("paired", c(1)), ("proper_pair", c(2)), ("reverse", c(16)),
    ("first_seg", c(64)), ("last_seg", c(128)), ("secondary", c(256)),
    ("qc_fail", c(512)), ("dup", c(1024)), ("supplementary", c(2048)),
]
print(", ".join(f"{k}={v}" for k, v in stats))
print("SELECT " + ",\n  ".join(
    f"CAST({v} AS BIGINT) AS {k}" for k, v in stats))
