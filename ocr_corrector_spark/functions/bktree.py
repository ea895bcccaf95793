"""BK-tree fuzzy dictionary search.

Re-implements the metric-tree semantics of ``/root/reference/corrector/
utils/BKtree.py``: insert chains on distance-to-current (BKtree.py:32-46),
BFS search visits a child iff ``dist - d <= edge <= dist + d``
(BKtree.py:49-72), results in BFS visit order.

Canonical-order deviation (documented): the reference builds the tree by
iterating a Python ``set`` of dictionary lines (BKtree.py:75-84), so its
node layout — and therefore the ORDER of search results — is
nondeterministic across processes.  This engine builds from the word list
in its given (file) order, which makes both the tree and result order
deterministic and reproduces the reference's published doctest ordering
(``search('宋还本金',1) -> ['未还本金','已还本金']``, BKtree.py:50-57)
for the shipped dictionary.  Only result order is affected; the downstream
argmax (keyword_corrector.py:84-99) breaks ties by first occurrence.

Scale note: the dictionary is broadcast-sized (~100 words), so at Spark
scale the tree lives in a broadcast variable and is built once per
executor.  For dictionaries this small, brute force is competitive; the
tree is kept for semantic parity and for larger dictionaries.
"""

from __future__ import annotations

from collections import deque

from .editdist import edit_distance


class _Node:
    __slots__ = ("word", "children")

    def __init__(self, word: str):
        self.word = word
        self.children: dict[int, _Node] = {}


class BKTree:
    def __init__(self, words, dist_func=edit_distance):
        self.dist_func = dist_func
        self.root: _Node | None = None
        # de-dup preserving first-seen order; drop empty lines like the
        # reference's .strip() pipeline leaves them (BKtree.py:77-80 keeps
        # '' in the set — harmless there; we drop for cleanliness)
        seen = set()
        self.words: list[str] = []
        for w in words:
            w = w.strip()
            if w and w not in seen:
                seen.add(w)
                self.words.append(w)
        for w in self.words:
            self._add(w)

    def _add(self, word: str) -> None:
        if self.root is None:
            self.root = _Node(word)
            return
        curr = self.root
        dist = self.dist_func(word, curr.word)
        while dist in curr.children:
            curr = curr.children[dist]
            dist = self.dist_func(word, curr.word)
        curr.children[dist] = _Node(word)

    def search(self, word: str, max_dist: int) -> list[str]:
        """All dictionary words within ``max_dist`` of ``word``, BFS order."""
        if self.root is None:
            return []
        found: list[str] = []
        queue = deque([self.root])
        dist_func = self.dist_func
        while queue:
            node = queue.popleft()
            dist = dist_func(node.word, word)
            if dist <= max_dist:
                found.append(node.word)
            lo, hi = dist - max_dist, dist + max_dist
            for edge, child in node.children.items():
                if lo <= edge <= hi:
                    queue.append(child)
        return found
