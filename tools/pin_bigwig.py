#!/usr/bin/env python3
"""Independent pure-Python BigWig (bbi) reader, written from the public
Kent et al. spec ("BigWig and BigBed: enabling browsing of large
distributed datasets", Bioinformatics 2010, supplemental tables) — the
same source the Scala reader AND writer were written from, but with no
shared code: this walks the chrom B+ tree and the R-tree itself, inflates
sections itself, and decodes all three wig section types (bedGraph,
variableStep, fixedStep).

Used two ways:
  1. BigWigWriteSpec shells out to it to cross-validate sink output with a
     non-JVM decoder (closing the "no external tool in sandbox" caveat).
  2. Run by hand on /root/reference/.../bigwig/test.bw, its output matches
     the Spark reader on the externally-produced fixture, which validates
     this pin tool itself.

Output is engine-comparable: float values print as their IEEE-754 bit
patterns (unsigned int), so Scala compares via floatToIntBits with no
formatting ambiguity.

Usage:
  pin_bigwig.py FILE               -> chrom\tstart\tend\tf32bits  (values)
  pin_bigwig.py FILE --zoom RL     -> chrom\tstart\tend\tvalid\tmin\tmax\tsum\tsumsq (f32 bits)
  pin_bigwig.py FILE --summary     -> valid\tminbits\tmaxbits\tsumbits\tsumsqbits (f64 bits)
  pin_bigwig.py FILE --check       -> structural checks (magics, counts), prints OK
"""
import struct
import sys
import zlib

BIGWIG_MAGIC = 0x888FFC26
CHROM_TREE_MAGIC = 0x78CA8C91
RTREE_MAGIC = 0x2468ACE0


def u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def u64(b, o):
    return struct.unpack_from("<Q", b, o)[0]


def read_header(b):
    (magic, version, n_zoom) = struct.unpack_from("<IHH", b, 0)
    if magic != BIGWIG_MAGIC:
        raise SystemExit(f"not a little-endian bigwig (magic {magic:#x})")
    (chrom_tree_off, full_data_off, full_index_off) = struct.unpack_from("<QQQ", b, 8)
    (field_count, defined_field_count) = struct.unpack_from("<HH", b, 32)
    auto_sql_off = u64(b, 36)
    total_summary_off = u64(b, 44)
    uncompress_buf = u32(b, 52)
    zooms = []
    for i in range(n_zoom):
        o = 64 + 24 * i
        zooms.append({"reduction": u32(b, o), "data_off": u64(b, o + 8),
                      "index_off": u64(b, o + 16)})
    return {"version": version, "chrom_tree_off": chrom_tree_off,
            "full_data_off": full_data_off, "full_index_off": full_index_off,
            "field_count": field_count,
            "defined_field_count": defined_field_count,
            "auto_sql_off": auto_sql_off,
            "total_summary_off": total_summary_off,
            "uncompress_buf": uncompress_buf, "zooms": zooms}


def read_chrom_tree(b, off):
    """Walk the chromosome B+ tree; returns {chrom_id: (name, size)}."""
    if u32(b, off) != CHROM_TREE_MAGIC:
        raise SystemExit(f"bad chrom tree magic at {off}")
    key_size = u32(b, off + 8)
    val_size = u32(b, off + 12)
    if val_size != 8:
        raise SystemExit(f"chrom tree valSize {val_size} != 8")
    out = {}

    def node(o):
        is_leaf, _, count = struct.unpack_from("<BBH", b, o)
        o += 4
        if is_leaf:
            for _ in range(count):
                name = b[o:o + key_size].rstrip(b"\x00").decode("ascii")
                cid = u32(b, o + key_size)
                size = u32(b, o + key_size + 4)
                out[cid] = (name, size)
                o += key_size + 8
        else:
            for _ in range(count):
                node(u64(b, o + key_size))
                o += key_size + 8

    node(off + 32)
    return out


def rtree_leaves(b, index_off):
    """Walk an R-tree; returns [(data_off, data_size)] in tree order, plus
    the header's item count for --check."""
    if u32(b, index_off) != RTREE_MAGIC:
        raise SystemExit(f"bad r-tree magic at {index_off}")
    item_count = u64(b, index_off + 8)
    leaves = []

    def node(o):
        is_leaf, _, count = struct.unpack_from("<BBH", b, o)
        o += 4
        if is_leaf:
            for _ in range(count):
                leaves.append((u64(b, o + 16), u64(b, o + 24)))
                o += 32
        else:
            for _ in range(count):
                node(u64(b, o + 16))
                o += 24

    node(index_off + 48)
    return leaves, item_count


def inflate(b, off, size, compressed):
    raw = b[off:off + size]
    return zlib.decompress(raw) if compressed else raw


def wig_intervals(sec):
    """Decode one wig section -> [(chrom_id, start, end, f32bits)]."""
    (cid, chrom_start, _chrom_end, item_step, item_span, typ, _res,
     count) = struct.unpack_from("<IIIIIBBH", sec, 0)
    o = 24
    out = []
    if typ == 1:  # bedGraph
        for _ in range(count):
            s, e, vb = struct.unpack_from("<III", sec, o)
            out.append((cid, s, e, vb))
            o += 12
    elif typ == 2:  # variableStep
        for _ in range(count):
            s, vb = struct.unpack_from("<II", sec, o)
            out.append((cid, s, s + item_span, vb))
            o += 8
    elif typ == 3:  # fixedStep
        for i in range(count):
            vb = u32(sec, o)
            s = chrom_start + i * item_step
            out.append((cid, s, s + item_span, vb))
            o += 4
    else:
        raise SystemExit(f"unknown wig section type {typ}")
    return out


def main(argv):
    path = argv[1]
    mode = argv[2] if len(argv) > 2 else "--values"
    with open(path, "rb") as f:
        b = f.read()
    h = read_header(b)
    chroms = read_chrom_tree(b, h["chrom_tree_off"])
    compressed = h["uncompress_buf"] > 0

    if mode == "--summary":
        vc = u64(b, h["total_summary_off"])
        bits = [struct.unpack_from("<Q", b, h["total_summary_off"] + 8 + 8 * i)[0]
                for i in range(4)]
        print("\t".join(str(x) for x in [vc] + bits))
        return 0

    if mode == "--check":
        # Kent semantics (verified on the external fixture): the main
        # index's itemCount counts SECTIONS (one leaf item each); a zoom
        # index's itemCount counts zoom RECORDS, and the u32 at the zoom
        # data offset holds the same record count.
        leaves, n = rtree_leaves(b, h["full_index_off"])
        sec_count = u64(b, h["full_data_off"])
        ok = (len(leaves) == n == sec_count)
        for z in h["zooms"]:
            zl, zn = rtree_leaves(b, z["index_off"])
            nrec = sum(len(inflate(b, off, size, compressed)) // 32
                       for off, size in zl)
            ok = ok and zn == nrec == u32(b, z["data_off"])
        # Kent files carry a trailing magic; tolerate files without one
        trailing = len(b) >= 4 and u32(b, len(b) - 4) == BIGWIG_MAGIC
        print(f"version={h['version']} sections={sec_count} "
              f"rtree_items={n} zooms={len(h['zooms'])} "
              f"trailing_magic={trailing} {'OK' if ok else 'MISMATCH'}")
        return 0 if ok else 1

    if mode == "--zoom":
        rl = int(argv[3])
        z = next((z for z in h["zooms"] if z["reduction"] == rl), None)
        if z is None:
            raise SystemExit(f"no zoom level {rl} (have "
                             f"{[x['reduction'] for x in h['zooms']]})")
        rows = []
        for off, size in rtree_leaves(b, z["index_off"])[0]:
            sec = inflate(b, off, size, compressed)
            for o in range(0, len(sec), 32):
                cid, s, e, valid = struct.unpack_from("<IIII", sec, o)
                bits = struct.unpack_from("<IIII", sec, o + 16)
                rows.append((chroms[cid][0], s, e, valid) + bits)
        rows.sort()
        for r in rows:
            print("\t".join(str(x) for x in r))
        return 0

    # --values
    rows = []
    for off, size in rtree_leaves(b, h["full_index_off"])[0]:
        sec = inflate(b, off, size, compressed)
        for cid, s, e, vb in wig_intervals(sec):
            rows.append((chroms[cid][0], s, e, vb))
    rows.sort()
    for r in rows:
        print("\t".join(str(x) for x in r))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
