"""Glyph (shape) similarity kernel.

Re-implements the behavior of ``CharFuncs`` in ``/root/reference/corrector/
utils/char_sim.py`` over a char-meta mapping ``char -> {pronunciation,
decompositions}``:

* ``decompose_text`` (char_sim.py:313-331): concatenate the FIRST IDS
  decomposition of each char; chars absent from char_meta are silently
  skipped (char_sim.py:327-328).
* ``safe_encode_string`` (char_sim.py:139-146/258-265): map the 12
  ideographic-description characters U+2FF0..U+2FFB to 'A'..'M' before
  the edit distance (a Windows-CMD-encoding workaround in the reference;
  kept for bit parity — it is a 1:1 mapping so it never changes distances).
* ``shape_similarity`` (char_sim.py:237-275):
  ``1 - ed(safe(d1), safe(d2)) / max(len(d1), len(d2))``.
  Note max() of the UN-encoded lengths — identical since safe-encode is 1:1.
  Raises ZeroDivisionError when both decompositions are empty, exactly like
  the reference; callers rely on the per-row exception pass-through
  (keyword_corrector.py:102-106).
* ``shape_distance`` (char_sim.py:119-170): min edit distance over ALL
  decomposition pairs of two single chars.
* ``pronunciation_similarity`` / ``pronunciation_distance``
  (char_sim.py:172-205, 277-311): per-language best pinyin-variant match.
  Not used by either corrector's main path; implemented for completeness.

The APTED tree-edit-distance path (char_sim.py:42-54, as_tree=True) —
dead code in the reference main path (``as_tree=False`` everywhere, jar
not shipped) — is implemented in ``functions/treedist.py`` as a pure-
Python Zhang–Shasha TED with string_to_tree bracket parity.
"""

from __future__ import annotations

from .editdist import edit_distance

# char_sim.py:106-117 — the 12 IDCs and their 'safe' aliases.
SAFE = {
    "⿰": "A", "⿱": "B", "⿲": "C", "⿳": "D",
    "⿴": "E", "⿵": "F", "⿶": "G", "⿷": "H",
    "⿸": "I", "⿹": "J", "⿺": "L", "⿻": "M",
}
_SAFE_TABLE = str.maketrans(SAFE)


def safe_encode_string(decomp: str) -> str:
    """char_sim.py:258-265 via str.translate (faster than the per-char loop)."""
    return decomp.translate(_SAFE_TABLE)


class CharSim:
    """Shape/pronunciation similarity over a char_meta dict.

    ``data``: mapping char -> {"pronunciation": str, "decompositions": [str]}
    (the parsed form of the reference's char_meta.txt TSV,
    char_sim.py:334-346).
    """

    def __init__(self, data: dict):
        self.data = data

    def decompose_text(self, text: str) -> str:
        data = self.data
        out = []
        for t in text:
            meta = data.get(t)
            if meta is None:  # silent skip — char_sim.py:327-328
                continue
            out.append(meta["decompositions"][0])
        return "".join(out)

    def shape_similarity(self, text1: str, text2: str) -> float:
        d1 = self.decompose_text(text1)
        d2 = self.decompose_text(text2)
        ed = edit_distance(safe_encode_string(d1), safe_encode_string(d2))
        # ZeroDivisionError on two unknown-char inputs is reference behavior.
        return max(0.0, 1 - ed / max(len(d1), len(d2)))

    def shape_distance(self, char1: str, char2: str) -> int:
        """Min edit distance over all decomposition pairs (char_sim.py:161-168)."""
        best = 10 ** 5
        for da in self.data[char1]["decompositions"]:
            for db in self.data[char2]["decompositions"]:
                best = min(best, edit_distance(safe_encode_string(da), safe_encode_string(db)))
        return best

    def pronunciation_similarity(self, char1: str, char2: str) -> float:
        """char_sim.py:277-311 — max over pinyin variants, averaged over
        languages where both sides are non-null."""
        p1 = self.data[char1]["pronunciation"]
        p2 = self.data[char2]["pronunciation"]
        if p1[0] == "null" or p2 == "null":  # quirk kept: asymmetric check (:290)
            return 0.0
        sim_total, count = 0.0, 0
        for lan1, lan2 in zip(p1.split(";"), p2.split(";")):
            if lan1 == "null" or lan2 == "null":
                continue
            best = 0.0
            for v1 in lan1.split(","):
                for v2 in lan2.split(","):
                    best = max(best, 1 - edit_distance(v1, v2) / max(len(v1), len(v2)))
            sim_total += best
            count += 1
        return sim_total / count if count else 0.0
