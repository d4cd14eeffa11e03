"""Hand-assemble an LMDB data file byte-by-byte from the on-disk format spec.

Purpose: cross-validate `lfm_tpu/data/minilmdb.py`'s reader against a database
it did NOT write (VERDICT r2 item 7 — liblmdb and the `lmdb` binding do not
exist in this environment, so the fixture is assembled here directly from the
liblmdb header layout, field by field, with offsets cited inline). The page
arrangement is deliberately DIFFERENT from what `minilmdb.write_db` produces:

  * physical node order inside pages is scrambled (liblmdb's insert/delete
    churn leaves nodes in arbitrary physical order; only the mp_ptrs pointer
    array is sorted) — write_db always lays nodes down in key order;
  * the stale meta page carries the OLDER txnid and a stale root, so the
    reader's pick-newest-meta logic is exercised against disagreeing metas —
    write_db emits two consistent metas;
  * page numbering interleaves branch before overflow — write_db always
    appends the branch last;
  * one leaf node has an odd on-page size to pin the EVEN() padding rule.

Struct layout per liblmdb lmdb.h / mdb.c (64-bit build, 4096-byte pages):

  MDB_page  (16 bytes): mp_pgno u64 | mp_pad u16 | mp_flags u16 |
             { pb_lower u16, pb_upper u16 } (union: pb_pages u32 for
             P_OVERFLOW); node pointer array mp_ptrs[] of u16 page-relative
             offsets starts at byte 16 (PAGEHDRSZ), nodes grow down from
             mp_upper. (mdb.c NODEPTR: ptr + mp_ptrs[i], PAGEBASE==0)
  MDB_node  (8 bytes):  mn_lo u16 | mn_hi u16 | mn_flags u16 | mn_ksize u16,
             key at byte 8. Leaf: data size = lo|(hi<<16), data follows key;
             F_BIGDATA (0x01) => data area holds the u64 overflow pgno.
             Branch: child pgno = lo|(hi<<16)|(mn_flags<<32) (NODEPGNO).
             Node sizes are rounded up to even (mdb.c EVEN()).
  MDB_meta  (at byte 16 of meta page): mm_magic u32 = 0xBEEFC0DE |
             mm_version u32 = 1 | mm_address u64 | mm_mapsize u64 |
             mm_dbs[2] (free DB, main DB) | mm_last_pg u64 | mm_txnid u64
  MDB_db    (48 bytes): md_pad u32 | md_flags u16 | md_depth u16 |
             md_branch_pages u64 | md_leaf_pages u64 | md_overflow_pages u64 |
             md_entries u64 | md_root u64

Run: python tools/make_lmdb_fixture.py [outdir]   (default tests/fixtures/lmdb_handmade)
"""

import os
import struct
import sys

PAGE = 4096
PAGEHDRSZ = 16

P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
P_INVALID = 0xFFFFFFFFFFFFFFFF

# The five entries, in key order. b"3x" gives an odd node size (8+2+5=15);
# b"zz-big"'s 6000-byte value needs a 2-page overflow run
# ((16 + 6000 + 4095) // 4096 == 2).
BIG = bytes((i * 7 + 3) % 251 for i in range(6000))
ITEMS = [
    (b"0", b"alpha"),
    (b"1", b"beta-value"),
    (b"2", b"gamma!"),
    (b"3x", b"delta"),
    (b"zz-big", BIG),
]


def leaf_node(key: bytes, data: bytes, ovf_pgno=None) -> bytes:
    """MDB_node for a leaf page. lo/hi = full data size even for F_BIGDATA
    (mdb.c: NODEDSZ stays the logical size; the node body is the pgno)."""
    dsize = len(data)
    flags = F_BIGDATA if ovf_pgno is not None else 0
    body = struct.pack("<Q", ovf_pgno) if ovf_pgno is not None else data
    return struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, flags,
                       len(key)) + key + body


def branch_node(key: bytes, pgno: int) -> bytes:
    return struct.pack("<HHHH", pgno & 0xFFFF, (pgno >> 16) & 0xFFFF,
                       (pgno >> 32) & 0xFFFF, len(key)) + key


def page_with_nodes(pgno: int, flags: int, nodes, scramble=False) -> bytes:
    """Pack nodes into a page. mp_ptrs[] stays in key order; with
    ``scramble`` the PHYSICAL placement runs in reverse order, as liblmdb
    leaves behind after churn (pointer order is authoritative, mdb.c
    mdb_node_add places at arbitrary free offsets)."""
    buf = bytearray(PAGE)
    order = list(range(len(nodes)))
    placement = list(reversed(order)) if scramble else order
    upper = PAGE
    offsets = {}
    for i in placement:
        node = nodes[i]
        size = len(node) + (len(node) & 1)  # EVEN()
        upper -= size
        buf[upper:upper + len(node)] = node
        offsets[i] = upper
    lower = PAGEHDRSZ + 2 * len(nodes)
    assert lower <= upper
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, flags, lower, upper)
    struct.pack_into(f"<{len(nodes)}H", buf, PAGEHDRSZ,
                     *[offsets[i] for i in order])
    return bytes(buf)


def overflow_run(pgno: int, data: bytes) -> bytes:
    npages = -(-(PAGEHDRSZ + len(data)) // PAGE)
    buf = bytearray(PAGE * npages)
    # overflow header: mp_pgno u64, pad u16, P_OVERFLOW u16, pb_pages u32 @12
    struct.pack_into("<QHH", buf, 0, pgno, 0, P_OVERFLOW)
    struct.pack_into("<I", buf, 12, npages)
    buf[PAGEHDRSZ:PAGEHDRSZ + len(data)] = data
    return bytes(buf)


def meta_page(pgno: int, txnid: int, main_db, last_pg: int) -> bytes:
    buf = bytearray(PAGE)
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
    struct.pack_into("<IIQQ", buf, PAGEHDRSZ, 0xBEEFC0DE, 1, 0, 1 << 20)
    off = PAGEHDRSZ + 24
    free_db = (0, 0, 0, 0, 0, 0, 0, P_INVALID)
    struct.pack_into("<IHHQQQQQ", buf, off, *free_db)
    struct.pack_into("<IHHQQQQQ", buf, off + 48, *main_db)
    struct.pack_into("<QQ", buf, off + 96, last_pg, txnid)
    return bytes(buf)


def build() -> bytes:
    # page map: 0 meta(new) | 1 meta(stale) | 2 leafA | 3 leafB | 4 branch |
    #           5..6 overflow run for "zz-big"
    leaf_a = page_with_nodes(2, P_LEAF, [leaf_node(*ITEMS[0]),
                                         leaf_node(*ITEMS[1]),
                                         leaf_node(*ITEMS[2])], scramble=True)
    leaf_b = page_with_nodes(3, P_LEAF, [leaf_node(*ITEMS[3]),
                                         leaf_node(ITEMS[4][0], BIG,
                                                   ovf_pgno=5)])
    # first branch key is implicit-lowest: ksize 0 (mdb.c mdb_node_add)
    branch = page_with_nodes(4, P_BRANCH, [branch_node(b"", 2),
                                           branch_node(b"3x", 3)])
    ovf = overflow_run(5, BIG)
    # meta 0: the CURRENT state (txnid 2). meta 1: STALE — txnid 1, root
    # still pointing at leaf 2 alone with 3 entries (pre-split snapshot).
    main_new = (0, 0, 2, 1, 2, 2, 5, 4)  # depth 2, 1 branch, 2 leaves, 2 ovf
    main_old = (0, 0, 1, 0, 1, 0, 3, 2)
    m0 = meta_page(0, 2, main_new, last_pg=6)
    m1 = meta_page(1, 1, main_old, last_pg=2)
    return m0 + m1 + leaf_a + leaf_b + branch + ovf


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "lmdb_handmade")
    os.makedirs(outdir, exist_ok=True)
    blob = build()
    with open(os.path.join(outdir, "data.mdb"), "wb") as f:
        f.write(blob)
    print(f"wrote {os.path.join(outdir, 'data.mdb')} ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
