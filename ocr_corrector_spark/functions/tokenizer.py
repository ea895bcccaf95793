"""BERT-style tokenization + masked-sentence framing (SURVEY.md §2c
T11/T12).

Fresh implementation of the published WordPiece tokenization algorithm
(Devlin et al. 2018; the reference vendors Google's Apache-2.0
tokenization.py at /root/reference/corrector/bert_modeling/
tokenization.py:107-308) and of the reference's sentence framing / mask
building (masked_lm.py:251-302):

* basic pass: strip control chars, normalize whitespace, surround CJK
  chars with spaces, optional lowercase+accent-strip, split punctuation;
* wordpiece pass: greedy longest-match-first against the vocab with
  ``##`` continuations, ``[UNK]`` fallback;
* framing: tokens = [CLS] 。 text 。 [SEP] — error offsets shift by +2 —
  and a position is [MASK]-substituted iff the sentence has <= 3 errors,
  otherwise the original char is kept (masked_lm.py:285-302), padded to
  ``max_seq_length``.

For pure-CJK fixture text the basic+wordpiece passes degenerate to
char-splitting, exactly as in the reference; the vocab is parameterized
(production: the public BERT-base-Chinese vocab.txt; tests: a compact
charset vocab).
"""

from __future__ import annotations

import unicodedata

SPECIAL_TOKENS = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (
        (33 <= cp <= 47)
        or (58 <= cp <= 64)
        or (91 <= cp <= 96)
        or (123 <= cp <= 126)
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0xF900 <= cp <= 0xFAFF
    )


def basic_tokenize(text: str, lowercase: bool = True) -> list[str]:
    # clean + CJK spacing
    cleaned = []
    for ch in text:
        if ord(ch) == 0 or ord(ch) == 0xFFFD or _is_control(ch):
            continue
        if _is_whitespace(ch):
            cleaned.append(" ")
        elif _is_cjk(ch):
            cleaned.append(f" {ch} ")
        else:
            cleaned.append(ch)
    tokens = []
    for tok in "".join(cleaned).split():
        if lowercase:
            tok = tok.lower()
            tok = "".join(
                c for c in unicodedata.normalize("NFD", tok)
                if unicodedata.category(c) != "Mn"
            )
        # split punctuation into standalone tokens
        buf = []
        for ch in tok:
            if _is_punctuation(ch):
                if buf:
                    tokens.append("".join(buf))
                    buf = []
                tokens.append(ch)
            else:
                buf.append(ch)
        if buf:
            tokens.append("".join(buf))
    return tokens


def wordpiece_tokenize(
    tokens: list[str], vocab: set[str], max_chars_per_word: int = 200
) -> list[str]:
    out = []
    for token in tokens:
        if len(token) > max_chars_per_word:
            out.append("[UNK]")
            continue
        start = 0
        pieces = []
        bad = False
        while start < len(token):
            end = len(token)
            cur = None
            while start < end:
                sub = token[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                bad = True
                break
            pieces.append(cur)
            start = end
        out.extend(["[UNK]"] if bad else pieces)
    return out


def tokenize(text: str, vocab: set[str]) -> list[str]:
    return wordpiece_tokenize(basic_tokenize(text), vocab)


def frame_sentence(
    tokens: list[str],
    err_positions: list[int],
    max_seq_length: int = 64,
    max_mask_per_sentence: int = 3,
) -> tuple[list[str], list[int], list[int]]:
    """masked_lm.py:251-302: frame as [CLS] 。 tokens 。 [SEP]; error
    offsets +2; [MASK]-substitute iff #errors <= max_mask; pad.

    Returns (framed_tokens, input_mask, shifted_error_positions).
    """
    framed = ["[CLS]", "。"] + list(tokens) + ["。", "[SEP]"]
    shifted = [e + 2 for e in err_positions]
    if len(err_positions) <= max_mask_per_sentence:
        for p in shifted:
            if 0 <= p < len(framed):
                framed[p] = "[MASK]"
    framed = framed[:max_seq_length]
    input_mask = [1] * len(framed)
    while len(framed) < max_seq_length:
        framed.append("[PAD]")
        input_mask.append(0)
    return framed, input_mask, shifted


def load_vocab(path: str) -> "OrderedDict[str, int]":
    """vocab.txt loader with the reference's EXACT shape
    (tokenization.py:70-82: ``vocab[token.strip()] = line_index`` for every
    line until EOF, 21,128 tokens for BERT-base-Chinese) → ordered
    ``token -> id`` dict.  Reference-parity consequences kept on purpose,
    because the ids must align with a checkpoint's embedding-matrix rows:
    a blank line maps the empty token to its line index; a duplicate token
    keeps the LAST line's index (later assignment overwrites), and ids keep
    advancing — so ids are line numbers, never compacted."""
    from collections import OrderedDict

    vocab: "OrderedDict[str, int]" = OrderedDict()
    with open(path, encoding="utf-8") as f:
        for index, line in enumerate(f):
            vocab[line.strip()] = index
    return vocab


def inverse_vocab(vocab) -> dict[int, str]:
    """id -> token inverse (tokenization.py:95's inv_vocab)."""
    return {i: t for t, i in vocab.items()}


def build_vocab(texts, extra=SPECIAL_TOKENS) -> set[str]:
    """Compact charset vocab for deterministic tests/benches: every char of
    the given corpus (plus specials and the CJK numerals used by the digit
    rewrite)."""
    vocab = set(extra)
    vocab.update("一二三四五六七八九零。")
    for t in texts:
        vocab.update(t)
    return vocab
