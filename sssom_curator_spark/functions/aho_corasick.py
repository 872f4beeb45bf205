"""Pure-Python Aho–Corasick automaton for broadcast lexical indices.

The reference probes names one at a time against a gilda grounder dict
(predict/lexical.py:229,256-310). At web scale the probe side is document
text, so the index must be an automaton that finds *all* label occurrences
in one pass (BASELINE.json north_star: "Aho-Corasick-style lexical indices
broadcast to executors"). This implementation is dependency-free (no
pyahocorasick in the container), built once per executor inside an
iterator pandas UDF, and matches on token boundaries over normalized text.
"""

from __future__ import annotations

from collections import deque

__all__ = ["AhoCorasick"]


class AhoCorasick:
    """Classic trie + failure-link automaton over characters.

    ``add(pattern, payload)`` then ``build()``; ``find(text)`` yields
    ``(start, end, pattern)`` for every occurrence; ``find_words`` filters
    to token-boundary-aligned hits (a label "rna" must not fire inside
    "internal").
    """

    def __init__(self) -> None:
        # children, fail, and per-node output patterns; node 0 is root
        self._next: list[dict[str, int]] = [{}]
        self._fail: list[int] = [0]
        self._out: list[list[str]] = [[]]
        self._built = False

    def add(self, pattern: str) -> None:
        if not pattern:
            return
        node = 0
        for ch in pattern:
            nxt = self._next[node].get(ch)
            if nxt is None:
                nxt = len(self._next)
                self._next.append({})
                self._fail.append(0)
                self._out.append([])
                self._next[node][ch] = nxt
            node = nxt
        self._out[node].append(pattern)

    def build(self) -> None:
        queue: deque[int] = deque()
        for child in self._next[0].values():
            queue.append(child)
        while queue:
            node = queue.popleft()
            for ch, child in self._next[node].items():
                queue.append(child)
                fail = self._fail[node]
                while fail and ch not in self._next[fail]:
                    fail = self._fail[fail]
                self._fail[child] = self._next[fail].get(ch, 0) if self._next[fail].get(ch, 0) != child else 0
                self._out[child].extend(self._out[self._fail[child]])
        self._built = True

    def find(self, text: str):
        """Yield (start, end_exclusive, pattern) for every occurrence."""
        if not self._built:
            raise RuntimeError("call build() first")
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self._next[node]:
                node = self._fail[node]
            node = self._next[node].get(ch, 0)
            for pattern in self._out[node]:
                yield i - len(pattern) + 1, i + 1, pattern

    def find_words(self, text: str):
        """Occurrences aligned to token boundaries (space-delimited norm text)."""
        n = len(text)
        for start, end, pattern in self.find(text):
            left_ok = start == 0 or text[start - 1] == " "
            right_ok = end == n or text[end] == " "
            if left_ok and right_ok:
                yield start, end, pattern
