"""Tree edit distance over IDS glyph-decomposition trees — closes the one
remaining reference capability (T10, ``/root/reference/corrector/utils/
char_sim.py:42-54`` + ``:349-402``).

The reference shells out per pair to a non-shipped ``apted.jar`` (dead
code in its main path: ``as_tree=False`` everywhere), so round ≤3
excluded it by design.  This module implements the same capability from
PUBLIC knowledge with no subprocess:

* ``ids_to_tree`` — parse an IDS decomposition string into a node tree
  using the 12 ideographic-description characters' arities (⿲/⿳ take 3
  children, the rest 2 — the semantics of char_sim.py:16-27's table);
* ``tree_to_bracket`` — render the SAME ``{root{child}{child}}`` bracket
  string the reference's ``string_to_tree`` produces (its doctest goldens
  at char_sim.py:349-368 are pinned in tests/test_treedist.py), so any
  external APTED-compatible tool accepts our output unchanged;
* ``tree_edit_distance`` — unit-cost tree edit distance via the
  Zhang–Shasha algorithm (K. Zhang, D. Shasha, "Simple fast algorithms
  for the editing distance between trees and related problems", SIAM J.
  Comput. 18(6), 1989) — the classic O(n²·min-depth) DP over keyroots,
  implemented from the published recurrence (APTED computes the same
  distance with better worst-case bounds; for IDS trees of ≤ a few dozen
  nodes the difference is irrelevant);
* ``shape_distance_tree`` — min TED over the decomposition cross-product
  of two chars, mirroring shape_distance(as_tree=True)
  (char_sim.py:152-158), with the same safe-encoding relabel (1:1, so
  distances are unchanged — kept for output parity).

Degenerate inputs follow string_to_tree: a single char (or the literal
``null``) is a one-node tree.
"""

from __future__ import annotations

from .charsim import safe_encode_string

# char_sim.py:16-27 — IDC arity (number of component slots).
IDC_ARITY = {
    "⿰": 2, "⿱": 2, "⿲": 3, "⿳": 3,
    "⿴": 2, "⿵": 2, "⿶": 2, "⿷": 2,
    "⿸": 2, "⿹": 2, "⿺": 2, "⿻": 2,
}


class Node:
    __slots__ = ("label", "children")

    def __init__(self, label: str, children: list["Node"] | None = None):
        self.label = label
        self.children = children or []

    def __repr__(self) -> str:  # debugging aid only
        return tree_to_bracket(self)


def ids_to_tree(ids: str) -> Node:
    """Parse an IDS string (preorder: operator then components) into a
    Node tree.  A lone char — including a lone IDC, matching
    string_to_tree's ``len(string) != 1`` guard — or the literal ``null``
    is a leaf."""
    if not ids:
        raise ValueError("empty IDS string")
    if ids == "null" or len(ids) == 1:
        return Node(ids)
    if ids[0] not in IDC_ARITY:
        # string_to_tree asserts here (char_sim.py:397) — "any Error
        # raised implies the input string is invalid"
        raise ValueError(f"multi-char IDS must start with an IDC: {ids!r}")

    pos = 0

    def parse() -> Node:
        nonlocal pos
        if pos >= len(ids):
            raise ValueError(f"truncated IDS: {ids!r}")
        c = ids[pos]
        pos += 1
        node = Node(c)
        if c in IDC_ARITY:
            for _ in range(IDC_ARITY[c]):
                node.children.append(parse())
        return node

    root = parse()
    if pos != len(ids):
        raise ValueError(f"trailing components in IDS: {ids!r}")
    return root


def tree_to_bracket(root: Node) -> str:
    """The reference's string_to_tree output format: every node is
    ``{label ...children}``."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        parts.append("{")
        parts.append(n.label)
        for ch in n.children:
            walk(ch)
        parts.append("}")

    walk(root)
    return "".join(parts)


def ids_to_bracket(ids: str) -> str:
    """string_to_tree semantics end-to-end (IDS in, bracket string out)."""
    return tree_to_bracket(ids_to_tree(ids))


def _postorder(root: Node) -> tuple[list[str], list[int]]:
    """1-indexed postorder labels and leftmost-leaf-descendant indices."""
    labels: list[str] = [""]  # 1-indexed
    lml: list[int] = [0]

    def walk(n: Node) -> int:
        first_leaf = None
        for ch in n.children:
            leaf = walk(ch)
            if first_leaf is None:
                first_leaf = leaf
        labels.append(n.label)
        idx = len(labels) - 1
        lml.append(first_leaf if first_leaf is not None else idx)
        return lml[idx]

    walk(root)
    return labels, lml


def _keyroots(lml: list[int]) -> list[int]:
    """Keyroots: the HIGHEST-postorder node for each distinct leftmost
    leaf (the roots of subtrees whose forest DP must run separately)."""
    last: dict[int, int] = {}
    for i in range(1, len(lml)):
        last[lml[i]] = i
    return sorted(last.values())


def tree_edit_distance(a: Node | str, b: Node | str) -> int:
    """Unit-cost TED (insert 1, delete 1, relabel 1 if labels differ) —
    Zhang–Shasha keyroot/forest-distance DP.  Accepts Node trees or raw
    IDS strings."""
    if isinstance(a, str):
        a = ids_to_tree(a)
    if isinstance(b, str):
        b = ids_to_tree(b)
    l1, lml1 = _postorder(a)
    l2, lml2 = _postorder(b)
    n1, n2 = len(l1) - 1, len(l2) - 1
    td = [[0] * (n2 + 1) for _ in range(n1 + 1)]

    for i in _keyroots(lml1):
        for j in _keyroots(lml2):
            li, lj = lml1[i], lml2[j]
            m, n = i - li + 2, j - lj + 2
            fd = [[0] * n for _ in range(m)]
            for di in range(1, m):
                fd[di][0] = fd[di - 1][0] + 1
            for dj in range(1, n):
                fd[0][dj] = fd[0][dj - 1] + 1
            for di in range(1, m):
                for dj in range(1, n):
                    i1 = li + di - 1
                    j1 = lj + dj - 1
                    if lml1[i1] == li and lml2[j1] == lj:
                        cost = 0 if l1[i1] == l2[j1] else 1
                        fd[di][dj] = min(
                            fd[di - 1][dj] + 1,
                            fd[di][dj - 1] + 1,
                            fd[di - 1][dj - 1] + cost,
                        )
                        td[i1][j1] = fd[di][dj]
                    else:
                        fd[di][dj] = min(
                            fd[di - 1][dj] + 1,
                            fd[di][dj - 1] + 1,
                            fd[lml1[i1] - li][lml2[j1] - lj] + td[i1][j1],
                        )
    return td[n1][n2]


def shape_distance_tree(char1: str, char2: str, data: dict, safe: bool = True) -> int:
    """shape_distance(as_tree=True) semantics (char_sim.py:152-158): min
    tree edit distance over all decomposition pairs.  ``safe`` relabels
    IDCs through the 1:1 SAFE table first — distances are identical
    either way; kept for parity with the reference's default."""
    best = 10 ** 5
    for da in data[char1]["decompositions"]:
        for db in data[char2]["decompositions"]:
            if safe:
                da2, db2 = safe_encode_string(da), safe_encode_string(db)
                ta = _relabel_safe_tree(da, da2)
                tb = _relabel_safe_tree(db, db2)
            else:
                ta, tb = ids_to_tree(da), ids_to_tree(db)
            best = min(best, tree_edit_distance(ta, tb))
    return best


def _relabel_safe_tree(ids: str, safe_ids: str) -> Node:
    """Parse with IDS arities, then relabel nodes with the safe-encoded
    chars (the safe string itself no longer parses — 'A' is not an IDC)."""
    root = ids_to_tree(ids)
    mapping = dict(zip(ids, safe_ids)) if len(ids) == len(safe_ids) else {}

    def walk(n: Node) -> None:
        n.label = mapping.get(n.label, n.label)
        for ch in n.children:
            walk(ch)

    walk(root)
    return root
