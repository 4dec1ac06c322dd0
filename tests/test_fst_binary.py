"""OpenFst BINARY format interop: vector/const fst readers against
hand-packed golden bytes (the wire format itself, independent of our
writer), writer round-trip, embedded symbol tables, aligned const files,
and auto-detection (closes the TLG.fst-as-shipped gap: Kaldi mkgraph
emits BINARY fsts, not fstprint text — SURVEY.md §2.1 latgen row, §3.4)."""

import math
import struct

import numpy as np
import pytest

from tpuasr.decode import SymbolTable, WFST
from tpuasr.decode.fst import FST_MAGIC, SYMTAB_MAGIC

INF = math.inf


def _s(txt: str) -> bytes:
    b = txt.encode()
    return struct.pack("<i", len(b)) + b


def _header(fsttype, version, flags, start, nstates, narcs,
            arctype="standard") -> bytes:
    return (struct.pack("<i", FST_MAGIC) + _s(fsttype) + _s(arctype)
            + struct.pack("<iiQqqq", version, flags, 0, start, nstates,
                          narcs))


# Reference machine used by every golden fixture:
#   0 --1:10/0.5--> 1,  0 --2:20/0.25--> 2,  1 --3:30/0.125--> 2,
#   final(2) = 0.75;  start = 0.
ARCS = {0: [(1, 10, 0.5, 1), (2, 20, 0.25, 2)], 1: [(3, 30, 0.125, 2)],
        2: []}
FINALS = {2: 0.75}


def _check(fst: WFST):
    assert fst.start == 0
    got = {s: [(a.ilabel, a.olabel, a.weight, a.dst) for a in arcs]
           for s, arcs in fst.arcs.items() if arcs}
    assert got == {s: a for s, a in ARCS.items() if a}
    assert fst.finals == pytest.approx(FINALS)
    cost, outs = fst.score([1, 3])
    assert cost == pytest.approx(0.5 + 0.125 + 0.75)
    assert outs == [10, 30]


def golden_vector_bytes(flags=0, symtabs=b"") -> bytes:
    body = b""
    for s in range(3):
        arcs = ARCS[s]
        body += struct.pack("<fq", FINALS.get(s, INF), len(arcs))
        for il, ol, w, dst in arcs:
            body += struct.pack("<iifi", il, ol, w, dst)
    return _header("vector", 2, flags, 0, 3, 3) + symtabs + body


def golden_const_bytes(aligned: bool) -> bytes:
    head = _header("const", 1 if aligned else 2, 0, 0, 3, 3)
    states = b""
    pos = 0
    for s in range(3):
        arcs = ARCS[s]
        nieps = sum(a[0] == 0 for a in arcs)
        noeps = sum(a[1] == 0 for a in arcs)
        states += struct.pack("<fIIII", FINALS.get(s, INF), pos,
                              len(arcs), nieps, noeps)
        pos += len(arcs)
    arcblob = b"".join(struct.pack("<iifi", il, ol, w, dst)
                       for s in range(3) for il, ol, w, dst in ARCS[s])
    if aligned:
        pad1 = b"\0" * (-len(head) % 16)
        pad2 = b"\0" * (-(len(head) + len(pad1) + len(states)) % 16)
        return head + pad1 + states + pad2 + arcblob
    return head + states + arcblob


def test_vector_golden(tmp_path):
    p = tmp_path / "v.fst"
    p.write_bytes(golden_vector_bytes())
    _check(WFST.load_binary(p))


@pytest.mark.parametrize("aligned", [False, True])
def test_const_golden(tmp_path, aligned):
    p = tmp_path / "c.fst"
    p.write_bytes(golden_const_bytes(aligned))
    fst = WFST.load_binary(p)
    _check(fst)


def test_embedded_symbol_tables(tmp_path):
    def symtab(name, syms):
        blob = struct.pack("<i", SYMTAB_MAGIC) + _s(name)
        blob += struct.pack("<qq", len(syms), len(syms))
        for i, s in enumerate(syms):
            blob += _s(s) + struct.pack("<q", i)
        return blob

    tabs = symtab("in", ["<eps>", "a", "b", "c"]) + symtab(
        "out", ["<eps>", "x"])
    p = tmp_path / "syms.fst"
    p.write_bytes(golden_vector_bytes(flags=0x1 | 0x2, symtabs=tabs))
    fst = WFST.load_binary(p)
    _check(fst)
    assert fst.isyms["c"] == 3 and fst.isyms.sym(1) == "a"
    assert fst.osyms["x"] == 1


def test_writer_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    fst = WFST(start=0)
    n = 12
    for _ in range(60):
        fst.add_arc(int(rng.integers(n)), int(rng.integers(n)),
                    int(rng.integers(0, 5)), int(rng.integers(0, 5)),
                    float(np.float32(rng.normal())))  # f32-exact weights
    fst.set_final(int(rng.integers(n)), 0.5)
    fst.set_final(0)
    p = tmp_path / "rt.fst"
    fst.save_binary(p, isyms=SymbolTable.from_list(["<eps>", "p", "q"]))
    back = WFST.load_binary(p)
    assert back.start == fst.start and back.finals == fst.finals
    assert {s: [(a.ilabel, a.olabel, a.weight, a.dst) for a in arcs]
            for s, arcs in back.arcs.items()} == \
           {s: [(a.ilabel, a.olabel, a.weight, a.dst) for a in arcs]
            for s, arcs in fst.arcs.items()}
    assert back.isyms.sym2id == {"<eps>": 0, "p": 1, "q": 2}
    for _ in range(20):
        labs = rng.integers(0, 5, size=rng.integers(1, 6)).tolist()
        assert back.score(labs)[0] == pytest.approx(fst.score(labs)[0])


def test_load_autodetect(tmp_path):
    fst = WFST(start=0)
    fst.add_arc(0, 1, 1, 1, 0.5)
    fst.set_final(1)
    bp, tp = tmp_path / "b.fst", tmp_path / "t.fst.txt"
    fst.save_binary(bp)
    fst.save_text(tp)
    for p in (bp, tp):
        got = WFST.load(p)
        assert got.accepts([1]) and got.score([1])[0] == pytest.approx(0.5)


def test_binary_matches_text(tmp_path):
    p = tmp_path / "g.fst"
    p.write_bytes(golden_vector_bytes())
    fst_b = WFST.load_binary(p)
    t = tmp_path / "g.txt"
    fst_b.save_text(t)
    fst_t = WFST.load_text(t)
    for labs in ([1, 3], [2], [1], [3, 1]):
        assert fst_t.score(labs)[0] == pytest.approx(fst_b.score(labs)[0])


def test_reject_garbage(tmp_path):
    p = tmp_path / "bad.fst"
    p.write_bytes(struct.pack("<i", FST_MAGIC) + _s("compact") + _s(
        "standard") + struct.pack("<iiQqqq", 2, 0, 0, 0, 0, 0))
    with pytest.raises(ValueError, match="unsupported fst type"):
        WFST.load_binary(p)
    p.write_bytes(b"\x01\x02\x03\x04garbage-not-an-fst")
    with pytest.raises(ValueError):
        WFST.load(p)          # not magic -> text parse -> unparseable


def _random_wfst(rng, n_states=12, n_arcs=40, n_syms=6):
    fst = WFST(start=int(rng.integers(n_states)))
    for _ in range(n_arcs):
        fst.add_arc(int(rng.integers(n_states)), int(rng.integers(n_states)),
                    int(rng.integers(n_syms + 1)),      # incl. eps
                    int(rng.integers(n_syms + 1)),
                    float(np.round(rng.uniform(0, 4), 3)))
    for s in rng.choice(n_states, size=3, replace=False):
        fst.set_final(int(s), float(np.round(rng.uniform(0, 2), 3)))
    # Text format cannot express an arc-less non-final start; make sure the
    # start is mentionable.
    if fst.start not in fst.arcs and fst.start not in fst.finals:
        fst.set_final(fst.start, 0.0)
    return fst


def test_roundtrip_property_binary_and_text(tmp_path):
    """Random WFSTs: save->load (both formats) preserves shortest-path
    scores AND transductions for random input strings."""
    rng = np.random.default_rng(7)
    for trial in range(8):
        fst = _random_wfst(rng)
        pb = tmp_path / f"g{trial}.fst"
        pt = tmp_path / f"g{trial}.txt"
        fst.save_binary(pb)
        fst.save_text(pt)
        back_b = WFST.load(pb)      # autodetect binary
        back_t = WFST.load(pt)      # autodetect text
        assert back_b.start == fst.start
        assert back_t.start == fst.start
        for _ in range(12):
            seq = rng.integers(1, 7, size=rng.integers(0, 5)).tolist()
            c0, o0 = fst.score(seq)
            for back in (back_b, back_t):
                c1, o1 = back.score(seq)
                if c0 == float("inf"):
                    assert c1 == float("inf")
                else:
                    assert abs(c0 - c1) < 1e-4 and o0 == o1, (
                        trial, seq, c0, c1, o0, o1)
