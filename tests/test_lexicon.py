"""Lexicon decoder: symbol tables, trie segmentation, noisy-phone recovery."""

from tpuasr.decode.lexicon import Lexicon, LexiconDecoder, SymbolTable


def build():
    phones = SymbolTable.from_list(["<blank>", "k", "ae", "t", "s", "d",
                                    "aa", "g"])
    words = SymbolTable.from_list(["<eps>", "cat", "cats", "dog", "at"])
    prons = [
        (words["cat"], (phones["k"], phones["ae"], phones["t"])),
        (words["cats"], (phones["k"], phones["ae"], phones["t"],
                         phones["s"])),
        (words["dog"], (phones["d"], phones["aa"], phones["g"])),
        (words["at"], (phones["ae"], phones["t"])),
    ]
    return phones, words, Lexicon(prons)


def test_symbol_table_roundtrip(tmp_path):
    phones, words, _ = build()
    words.save(tmp_path / "words.txt")
    loaded = SymbolTable.load(tmp_path / "words.txt")
    assert loaded.sym2id == words.sym2id
    assert loaded.sym(1) == "cat"


def test_exact_segmentation():
    phones, words, lex = build()
    dec = LexiconDecoder(lex)
    seq = [phones[p] for p in ["k", "ae", "t", "d", "aa", "g"]]
    assert dec.decode(seq) == [words["cat"], words["dog"]]


def test_longest_match_preferred():
    phones, words, lex = build()
    # word_score rewards words; "cats" (1 word) beats "cat"+skip(s).
    dec = LexiconDecoder(lex, word_score=1.0)
    seq = [phones[p] for p in ["k", "ae", "t", "s"]]
    assert dec.decode(seq) == [words["cats"]]


def test_noisy_phone_skipped():
    phones, words, lex = build()
    dec = LexiconDecoder(lex)
    seq = [phones[p] for p in ["k", "ae", "t"]] + [7] + \
          [phones[p] for p in ["ae", "t"]]
    # 'g' (7) in the middle is skipped; cat + at recovered.
    assert dec.decode(seq) == [words["cat"], words["at"]]


def test_lexicon_load(tmp_path):
    phones, words, _ = build()
    (tmp_path / "lexicon.txt").write_text("cat k ae t\ndog d aa g\n")
    lex = Lexicon.load(tmp_path / "lexicon.txt", words, phones)
    dec = LexiconDecoder(lex)
    seq = [phones[p] for p in ["d", "aa", "g"]]
    assert dec.decode(seq) == [words["dog"]]
