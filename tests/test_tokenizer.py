"""WordPiece tokenization + masked-sentence framing (SURVEY.md §2c T11/T12)."""

from ocr_corrector_spark.functions.tokenizer import (
    basic_tokenize,
    build_vocab,
    frame_sentence,
    tokenize,
    wordpiece_tokenize,
)


def test_basic_tokenize_cjk_spacing():
    # CJK chars split apart, ASCII words kept (tokenization.py:200-233 behavior)
    assert basic_tokenize("我爱spark引擎") == ["我", "爱", "spark", "引", "擎"]


def test_basic_tokenize_punct_and_case():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]


def test_basic_tokenize_accents_and_control():
    assert basic_tokenize("café\x00x") == ["cafex"]


def test_wordpiece_greedy_longest_match():
    vocab = {"un", "##aff", "##able", "aff"}
    assert wordpiece_tokenize(["unaffable"], vocab) == ["un", "##aff", "##able"]


def test_wordpiece_unknown():
    assert wordpiece_tokenize(["xyz"], {"a"}) == ["[UNK]"]


def test_tokenize_pure_cjk_degenerates_to_chars():
    vocab = build_vocab(["我爱北京天安门"])
    assert tokenize("我爱北京天安门", vocab) == list("我爱北京天安门")


def test_frame_sentence_mask_and_offsets():
    # masked_lm.py:251-302: [CLS] 。 text 。 [SEP]; offsets +2; mask iff <=3 errs
    tokens = list("我爱北京大安门")
    framed, mask, shifted = frame_sentence(tokens, [4], max_seq_length=16)
    assert framed[:2] == ["[CLS]", "。"]
    assert shifted == [6]
    assert framed[6] == "[MASK]"
    assert framed[9] == "。" and framed[10] == "[SEP]"
    assert framed[11] == "[PAD]" and mask[11] == 0
    assert len(framed) == len(mask) == 16


def test_frame_sentence_too_many_errors_keeps_chars():
    tokens = list("abcdefg")
    framed, _, shifted = frame_sentence(tokens, [0, 1, 2, 3], max_seq_length=16)
    assert shifted == [2, 3, 4, 5]
    assert framed[2:6] == ["a", "b", "c", "d"]  # >3 errors → no [MASK]
