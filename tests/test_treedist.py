"""T10 tree edit distance: bracket-format parity with the reference's
string_to_tree doctest goldens (char_sim.py:349-368) and Zhang–Shasha
correctness on hand-verified cases."""

import pytest

from ocr_corrector_spark.assets.char_meta import build_char_meta
from ocr_corrector_spark.functions.treedist import (
    ids_to_bracket,
    ids_to_tree,
    shape_distance_tree,
    tree_edit_distance,
    tree_to_bracket,
    Node,
)

CHAR_META = build_char_meta()

# the reference's own doctest goldens, verbatim
STRING_TO_TREE_GOLDENS = [
    ("⿱⿱⿰丿㇏⿰丿㇏⿱⿰丿㇏⿰丿㇏",
     "{⿱{⿱{⿰{丿}{㇏}}{⿰{丿}{㇏}}}{⿱{⿰{丿}{㇏}}{⿰{丿}{㇏}}}}"),  # 炎
    ("⿱⿰丿㇏⿱一⿱⿻一丨一",
     "{⿱{⿰{丿}{㇏}}{⿱{一}{⿱{⿻{一}{丨}}{一}}}}"),  # 全
    ("⿱⿰丿㇏⿻⿱一⿱⿻一丨一丷",
     "{⿱{⿰{丿}{㇏}}{⿻{⿱{一}{⿱{⿻{一}{丨}}{一}}}{丷}}}"),  # 金
    ("⿻⿻⿻一丨一⿴⿱⿰丨𠃌一一",
     "{⿻{⿻{⿻{一}{丨}}{一}}{⿴{⿱{⿰{丨}{𠃌}}{一}}{一}}}"),  # 車
    ("⿻⿻⿻一丨⿰丿㇏⿴⿱⿰丨𠃌一一",
     "{⿻{⿻{⿻{一}{丨}}{⿰{丿}{㇏}}}{⿴{⿱{⿰{丨}{𠃌}}{一}}{一}}}"),  # 東
    ("丿", "{丿}"),
    ("⿻", "{⿻}"),
]


@pytest.mark.parametrize("ids,expected", STRING_TO_TREE_GOLDENS)
def test_bracket_matches_reference_goldens(ids, expected):
    assert ids_to_bracket(ids) == expected


def test_invalid_ids_raises():
    with pytest.raises(ValueError):
        ids_to_tree("ab")  # multi-char non-IDC root
    with pytest.raises(ValueError):
        ids_to_tree("⿰丿")  # truncated: binary IDC with one component
    with pytest.raises(ValueError):
        ids_to_tree("⿰丿㇏一")  # trailing component


def test_ted_identity_and_symmetry():
    for ids, _ in STRING_TO_TREE_GOLDENS:
        assert tree_edit_distance(ids, ids) == 0
    a, b = "⿱⿰丿㇏⿱一⿱⿻一丨一", "⿱⿰丿㇏⿻⿱一⿱⿻一丨一丷"  # 全 vs 金
    assert tree_edit_distance(a, b) == tree_edit_distance(b, a) > 0


def test_ted_hand_verified_small_cases():
    # single relabel
    assert tree_edit_distance("丿", "㇏") == 1
    # leaf vs 3-node tree: insert operator + second leaf
    assert tree_edit_distance("丿", "⿰丿㇏") == 2
    # same shape, one differing leaf
    assert tree_edit_distance("⿰丿㇏", "⿰丿一") == 1
    # operator relabel only
    assert tree_edit_distance("⿰丿㇏", "⿱丿㇏") == 1


def test_ted_zhang_shasha_paper_example():
    """The classic example from Zhang & Shasha (1989), Fig. 4:
    T1 = f(d(a c(b)) e), T2 = f(c(d(a b)) e) — distance 2."""
    t1 = Node("f", [Node("d", [Node("a"), Node("c", [Node("b")])]), Node("e")])
    t2 = Node("f", [Node("c", [Node("d", [Node("a"), Node("b")])]), Node("e")])
    assert tree_edit_distance(t1, t2) == 2
    assert tree_edit_distance(t1, t1) == 0


def test_ted_triangle_inequality_spot():
    trees = [ids for ids, _ in STRING_TO_TREE_GOLDENS]
    for a in trees:
        for b in trees:
            for c in trees:
                ab = tree_edit_distance(a, b)
                bc = tree_edit_distance(b, c)
                ac = tree_edit_distance(a, c)
                assert ac <= ab + bc


def test_shape_distance_tree_over_char_meta():
    """as_tree=True analog over the committed mini char_meta: symmetric,
    zero on self, and bounded above by node-count sum."""
    chars = [c for c in ("田", "由", "牛", "午") if c in CHAR_META]
    assert len(chars) >= 2, "mini char_meta must cover the doctest chars"
    for c1 in chars:
        assert shape_distance_tree(c1, c1, CHAR_META) == 0
        for c2 in chars:
            d12 = shape_distance_tree(c1, c2, CHAR_META)
            d21 = shape_distance_tree(c2, c1, CHAR_META)
            assert d12 == d21 >= 0
    # 田/由 differ structurally but share most strokes: small distance
    if "田" in CHAR_META and "由" in CHAR_META:
        assert 1 <= shape_distance_tree("田", "由", CHAR_META) <= 4


def test_safe_relabel_never_changes_distance():
    if "田" in CHAR_META and "由" in CHAR_META:
        assert shape_distance_tree(
            "田", "由", CHAR_META, safe=True
        ) == shape_distance_tree("田", "由", CHAR_META, safe=False)


def test_bracket_roundtrip_stable():
    for ids, bracket in STRING_TO_TREE_GOLDENS:
        t = ids_to_tree(ids)
        assert tree_to_bracket(t) == bracket


# --- property check: Zhang-Shasha DP vs the naive exponential recurrence ----
def _naive_forest_ted(f1: tuple, f2: tuple, memo: dict) -> int:
    """Textbook ordered-forest edit distance (exponential, tiny inputs
    only): a forest is a tuple of (label, children-forest) pairs."""
    key = (f1, f2)
    if key in memo:
        return memo[key]
    if not f1:
        r = sum(_size(t) for t in f2)
    elif not f2:
        r = sum(_size(t) for t in f1)
    else:
        (l1, c1), rest1 = f1[-1], f1[:-1]
        (l2, c2), rest2 = f2[-1], f2[:-1]
        r = min(
            _naive_forest_ted(rest1 + c1, f2, memo) + 1,           # delete
            _naive_forest_ted(f1, rest2 + c2, memo) + 1,           # insert
            _naive_forest_ted(rest1, rest2, memo)                  # match roots
            + _naive_forest_ted(c1, c2, memo)
            + (0 if l1 == l2 else 1),
        )
    memo[key] = r
    return r


def _size(t: tuple) -> int:
    return 1 + sum(_size(c) for c in t[1])


def _to_tuple(n: Node) -> tuple:
    return (n.label, tuple(_to_tuple(c) for c in n.children))


def _from_tuple(t: tuple) -> Node:
    return Node(t[0], [_from_tuple(c) for c in t[1]])


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _labels = st.sampled_from("abc一丨丿")

    def _tree_strategy():
        return st.recursive(
            st.tuples(_labels, st.just(())),
            lambda children: st.tuples(
                _labels, st.lists(children, max_size=3).map(tuple)
            ),
            max_leaves=6,
        )

    @settings(max_examples=150, deadline=None)
    @given(_tree_strategy(), _tree_strategy())
    def test_ted_matches_naive_recurrence(t1, t2):
        a, b = _from_tuple(t1), _from_tuple(t2)
        expected = _naive_forest_ted((t1,), (t2,), {})
        assert tree_edit_distance(a, b) == expected

except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass
