"""Classic Porter (1980) stemmer, canonical-implementation variant.

Implements Martin Porter's original algorithm as published at
tartarus.org, including the two documented departures of the canonical
implementation from the 1980 paper (Step 2: ``bli -> ble`` instead of
``abli -> able``, and the added ``logi -> log`` rule).  This is the same
algorithm the reference engine applies per token via the public
``ca.rmen:porter-stemmer:1.0.0`` library (reference:
``parsing/Parser.java:93-101``), so stems must match token-for-token —
verified against 4.5k golden pairs produced by the reference's own
bundled stemmer class (``tests/fixtures/porter_golden.tsv``).

Written from the published algorithm description; pure Python, no
dependencies.  ``stem()`` is the scalar API; ``stem_many()`` memoizes
over an iterable for the vectorized tokenizer path.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class _Stemmer:
    """Stateful single-word stemmer (buffer + k/j indexes, as in the
    canonical array-based formulation)."""

    __slots__ = ("b", "k", "j")

    def __init__(self) -> None:
        self.b: list[str] = []
        self.k = 0  # index of last char of the current stem
        self.j = 0  # general offset set by ends()

    # -- predicates ------------------------------------------------------
    def _cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        """Number of consonant-vowel sequences in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowel_in_stem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        ln = len(s)
        if ln > self.k + 1:
            return False
        if "".join(self.b[self.k + 1 - ln : self.k + 1]) != s:
            return False
        self.j = self.k - ln
        return True

    def _setto(self, s: str) -> None:
        self.b[self.j + 1 : self.k + 1] = list(s)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    # -- steps -----------------------------------------------------------
    def _step1ab(self) -> None:
        if self.b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowel_in_stem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                self.k -= 1
                if self.b[self.k] in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step1c(self) -> None:
        if self._ends("y") and self._vowel_in_stem():
            self.b[self.k] = "i"

    _STEP2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("logi", "log"),
    )

    def _step2(self) -> None:
        for suf, rep in self._STEP2:
            if self._ends(suf):
                self._r(rep)
                return

    _STEP3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )

    def _step3(self) -> None:
        for suf, rep in self._STEP3:
            if self._ends(suf):
                self._r(rep)
                return

    _STEP4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )

    def _step4(self) -> None:
        for suf in self._STEP4:
            if self._ends(suf):
                if suf == "ion" and not (self.j >= 0 and self.b[self.j] in ("s", "t")):
                    continue
                if self._m() > 1:
                    self.k = self.j
                return

    def _step5(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    def stem(self, word: str) -> str:
        if len(word) <= 2:
            return word
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0
        self._step1ab()
        self._step1c()
        self._step2()
        self._step3()
        self._step4()
        self._step5()
        return "".join(self.b[: self.k + 1])


def stem(word: str) -> str:
    """Stem one lowercase word (words of length <= 2 pass through)."""
    return _Stemmer().stem(word)


def stem_many(words) -> dict:
    """Memoized stems for an iterable of words -> {word: stem}.

    Vocabularies are tiny relative to token streams (Heaps' law), so the
    tokenizer stems each *unique* token once and maps the rest.
    """
    st = _Stemmer()
    return {w: st.stem(w) for w in set(words)}
