"""Snowball stemmers, pure-Python ports of the PUBLISHED Snowball
algorithms (snowballstem.org) for the languages whose reference
analyzers use snowballstem (analysis/lang/{ru,nl,sv,da,no,fi,hu,tr}/
stemmer_*.go wire SnowballStemmerName): russian, dutch, swedish,
danish, norwegian, finnish, hungarian, turkish.

Each ``stem_xx(word) -> str`` expects an already-lowercased token
(the reference pipelines lowercase before stemming). Implementations
follow the algorithm descriptions, not any particular generated
source; validated against the reference's own analyzer/stemmer test
vectors in tests/test_snowball_stemmers.py."""

from __future__ import annotations

# --------------------------------------------------------------- helpers --


def _r1_pos(word: str, vowels: str) -> int:
    """R1 = region after the first non-vowel following a vowel."""
    for i in range(len(word) - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            return i + 2
    return len(word)


def _r2_pos(word: str, vowels: str) -> int:
    r1 = _r1_pos(word, vowels)
    for i in range(r1, len(word) - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            return i + 2
    return len(word)


def _ends_in(word: str, region_start: int, suffixes) -> str | None:
    """Longest suffix of ``word`` from ``suffixes`` that lies wholly
    inside the region starting at ``region_start``; None otherwise.
    (Snowball 'among' semantics: longest match wins, THEN the region
    condition is tested — a shorter in-region suffix does not fire if
    a longer out-of-region one matched.)"""
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best is not None and len(word) - len(best) >= region_start:
        return best
    return None


# ============================================================ SCANDINAVIAN
# Danish / Norwegian / Swedish share the shape: R1 (adjusted so it
# spans at least 3 letters), a big step-1 suffix set with an s-ending
# letter condition, a step-2 consonant-pair trim, and a small step 3.


def _scand_r1(word: str, vowels: str) -> int:
    r1 = _r1_pos(word, vowels)
    return max(r1, 3) if len(word) >= 3 else len(word)


_DA_VOWELS = "aeiouyæåø"
_DA_STEP1 = (
    "hed ethed ered e erede ende erende ene erne ere en heden eren er "
    "heder erer heds es endes erendes enes ernes eres ens hedens erens "
    "ers ets erets et eret".split()
)
_DA_S_ENDINGS = "abcdfghjklmnoprtvyzå"  # valid s-ending letters
_DA_STEP2 = ["gd", "dt", "gt", "kt"]
_DA_STEP3_IGST = ["ig", "lig", "elig", "els"]


def stem_da(word: str) -> str:
    """Danish (snowballstem.org/algorithms/danish/stemmer.html)."""
    if len(word) <= 2:
        return word
    r1 = _scand_r1(word, _DA_VOWELS)

    # step 1 (one among: longest match wins, then the condition)
    suf = _ends_in(word, r1, _DA_STEP1 + ["s"])
    if suf == "s":
        if len(word) >= 2 and word[-2] in _DA_S_ENDINGS:
            word = word[:-1]
    elif suf:
        word = word[: -len(suf)]

    # step 2: if ends gd/dt/gt/kt inside R1 → drop last letter
    if _ends_in(word, r1, _DA_STEP2):
        word = word[:-1]

    # step 3: igst → drop st; then among (ig lig elig els → delete +
    # repeat step 2 | løst → løs) in R1
    if word.endswith("igst"):
        word = word[:-2]
    suf = _ends_in(word, r1, _DA_STEP3_IGST + ["løst"])
    if suf == "løst":
        word = word[:-1]
    elif suf:
        word = word[: -len(suf)]
        # repeat step 2
        if _ends_in(word, r1, _DA_STEP2):
            word = word[:-1]

    # step 4: undouble — double consonant at end inside R1 → single
    if (
        len(word) >= 2
        and len(word) - 1 >= r1
        and word[-1] == word[-2]
        and word[-1] not in _DA_VOWELS
    ):
        word = word[:-1]
    return word


_NO_VOWELS = "aeiouyæåø"
_NO_STEP1 = (
    "a e ede ande ende ane ene hetene en heten ar er heter as es edes "
    "endes enes hetenes ens hetens ers ets et het ast".split()
)
_NO_S_ENDINGS = "bcdfghjlmnoprtvyz"
_NO_STEP2 = ["dt", "vt"]
_NO_STEP3 = (
    "leg eleg ig eig lig elig els lov elov slov hetslov".split()
)


def stem_no(word: str) -> str:
    """Norwegian (snowballstem.org/algorithms/norwegian/stemmer.html).
    The s-ending also fires after 'k' preceded by a non-vowel, and
    'erte'/'ert' → 'er'."""
    if len(word) <= 2:
        return word
    r1 = _scand_r1(word, _NO_VOWELS)

    suf = _ends_in(word, r1, _NO_STEP1 + ["erte", "ert", "s"])
    if suf == "erte" or suf == "ert":
        word = word[: -len(suf)] + "er"
    elif suf == "s":
        prev = word[-2] if len(word) >= 2 else ""
        prev2 = word[-3] if len(word) >= 3 else ""
        if prev in _NO_S_ENDINGS or (
            prev == "k" and prev2 not in _NO_VOWELS
        ):
            word = word[:-1]
    elif suf:
        word = word[: -len(suf)]

    if _ends_in(word, r1, _NO_STEP2):
        word = word[:-1]

    suf = _ends_in(word, r1, _NO_STEP3)
    if suf:
        word = word[: -len(suf)]
    return word


_SV_VOWELS = "aeiouyäåö"
_SV_STEP1 = (
    "a arna erna heterna orna ad e ade ande arne are aste en anden "
    "aren heten ern ar er heter or as arnas ernas ornas es ades andes "
    "ens arens hetens erns at andet het ast".split()
)
_SV_S_ENDINGS = "bcdfghjklmnoprtvy"
_SV_STEP2 = ["dd", "gd", "nn", "dt", "gt", "kt", "tt"]
_SV_STEP3_DEL = ["lig", "ig", "els"]


def stem_sv(word: str) -> str:
    """Swedish (snowballstem.org/algorithms/swedish/stemmer.html)."""
    if len(word) <= 2:
        return word
    r1 = _scand_r1(word, _SV_VOWELS)

    suf = _ends_in(word, r1, _SV_STEP1 + ["s"])
    if suf == "s":
        if len(word) >= 2 and word[-2] in _SV_S_ENDINGS:
            word = word[:-1]
    elif suf:
        word = word[: -len(suf)]

    if _ends_in(word, r1, _SV_STEP2):
        word = word[:-1]

    suf = _ends_in(word, r1, _SV_STEP3_DEL + ["löst", "fullt"])
    if suf in ("lig", "ig", "els"):
        word = word[: -len(suf)]
    elif suf == "löst" or suf == "fullt":
        word = word[:-1]
    return word


# ================================================================== DUTCH

_NL_VOWELS = "aeiouyè"


def _nl_prelude(word: str) -> str:
    # substitute accents, y/i handling
    table = str.maketrans("äëïöüáéíóú", "aeiouaeiou")
    word = word.translate(table)
    out = []
    n = len(word)
    for i, ch in enumerate(word):
        if ch == "y":
            if i == 0 or word[i - 1] in _NL_VOWELS:
                out.append("Y")
                continue
        if ch == "i":
            if (
                0 < i < n - 1
                and word[i - 1] in _NL_VOWELS
                and word[i + 1] in _NL_VOWELS
            ):
                out.append("I")
                continue
        out.append(ch)
    return "".join(out)


def _nl_undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def stem_nl(word: str) -> str:
    """Dutch (snowballstem.org/algorithms/dutch/stemmer.html)."""
    if len(word) <= 2:
        return word
    word = _nl_prelude(word)
    vowels = _NL_VOWELS
    r1 = max(_r1_pos(word, vowels), 3) if len(word) >= 3 else len(word)
    r2 = _r2_pos(word, vowels)
    e_removed = False

    def valid_en(w, slen):
        # 'en'-ending: in R1, preceded by a valid non-vowel that is
        # not part of 'gem'
        stem_end = len(w) - slen
        if stem_end < r1:
            return False
        if stem_end == 0 or w[stem_end - 1] in vowels:
            return False
        if w[max(0, stem_end - 3):stem_end] == "gem":
            return False
        return True

    # step 1
    if word.endswith("heden"):
        if len(word) - 5 >= r1:
            word = word[:-5] + "heid"
    elif word.endswith("ene") and valid_en(word, 3):
        word = _nl_undouble(word[:-3])
    elif word.endswith("en") and valid_en(word, 2):
        word = _nl_undouble(word[:-2])
    elif word.endswith(("se", "s")):
        slen = 2 if word.endswith("se") else 1
        stem_end = len(word) - slen
        if stem_end >= r1 and stem_end > 0 and (
            word[stem_end - 1] not in vowels + "j"
        ):
            word = word[:stem_end]

    # step 2: suffix e in R1 preceded by non-vowel
    if (
        word.endswith("e")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] not in vowels
    ):
        word = _nl_undouble(word[:-1])
        e_removed = True

    # step 3a: heid in R2, not preceded by c; then en-ending on rest
    if word.endswith("heid") and len(word) - 4 >= r2 and (
        len(word) < 5 or word[-5] != "c"
    ):
        word = word[:-4]
        if word.endswith("en") and valid_en(word, 2):
            word = _nl_undouble(word[:-2])

    # step 3b: d-suffixes
    if word.endswith(("end", "ing")) and len(word) - 3 >= r2:
        word = word[:-3]
        if (
            word.endswith("ig")
            and len(word) - 2 >= r2
            and (len(word) < 3 or word[-3] != "e")
        ):
            word = word[:-2]
        else:
            word = _nl_undouble(word)
    elif (
        word.endswith("ig")
        and len(word) - 2 >= r2
        and (len(word) < 3 or word[-3] != "e")
    ):
        word = word[:-2]
    elif word.endswith("lijk") and len(word) - 4 >= r2:
        word = word[:-4]
        # then repeat step 2
        if (
            word.endswith("e")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] not in vowels
        ):
            word = _nl_undouble(word[:-1])
    elif word.endswith("baar") and len(word) - 4 >= r2:
        word = word[:-4]
    elif word.endswith("bar") and len(word) - 3 >= r2 and e_removed:
        word = word[:-3]

    # step 4: undouble vowel — CVD (D = non-I/non-o consonant) where
    # V is a doubled aa/ee/oo/uu → drop one vowel
    if len(word) >= 4:
        c1, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            c1 not in vowels
            and v1 == v2
            and v1 in "aeou"
            and d not in vowels
            and d != "I"
        ):
            word = word[:-2] + word[-1]

    return word.replace("Y", "y").replace("I", "i")


# ================================================================ RUSSIAN

_RU_VOWELS = "аеиоуыэюя"

_RU_PERF_GERUND_1 = ["в", "вши", "вшись"]  # must follow а/я
_RU_PERF_GERUND_2 = ["ив", "ивши", "ившись", "ыв", "ывши", "ывшись"]
_RU_ADJECTIVE = (
    "ее ие ые ое ими ыми ей ий ый ой ем им ым ом его ого ему ому их "
    "ых ую юю ая яя ою ею".split()
)
_RU_PARTICIPLE_1 = ["ем", "нн", "вш", "ющ", "щ"]  # must follow а/я
_RU_PARTICIPLE_2 = ["ивш", "ывш", "ующ"]
_RU_VERB_1 = (
    "ла на ете йте ли й л ем н ло но ет ют ны ть ешь нно".split()
)  # must follow а/я
_RU_VERB_2 = (
    "ила ыла ена ейте уйте ите или ыли ей уй ил ыл им ым ен ило ыло "
    "ено ят ует уют ит ыт ены ить ыть ишь ую ю".split()
)
_RU_NOUN = (
    "а ев ов ие ье е иями ями ами еи ии и ией ей ой ий й иям ям ием "
    "ем ам ом о у ах иях ях ы ь ию ью ю ия ья я".split()
)
_RU_SUPERLATIVE = ["ейш", "ейше"]
_RU_DERIVATIONAL = ["ост", "ость"]


def _ru_fire(word: str, rv: int, suffixes, precede: str | None = None):
    """Longest suffix in RV (optionally requiring a preceding а/я;
    the snowball source setlimits to RV, so the preceding letter must
    sit inside RV too)."""
    best = None
    for s in suffixes:
        if len(s) > len(best or ""):
            if precede is not None:
                for p in precede:
                    if word.endswith(p + s):
                        best = s
                        break
            elif word.endswith(s):
                best = s
    if best is None:
        return None
    span = len(best) + (1 if precede is not None else 0)
    if len(word) - span >= rv:
        return best
    return None


def stem_ru(word: str) -> str:
    """Russian (snowballstem.org/algorithms/russian/stemmer.html).
    ё is treated as е (the reference lowercases first; snowball
    folds ё→е in its prelude)."""
    word = word.replace("ё", "е")
    # RV: after the first vowel
    rv = len(word)
    for i, ch in enumerate(word):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    r2 = _r2_pos(word, _RU_VOWELS)

    # step 1: perfective gerund, else (reflexive?) adj/verb/noun
    suf = _ru_fire(word, rv, _RU_PERF_GERUND_2) or _ru_fire(
        word, rv, _RU_PERF_GERUND_1, precede="ая"
    )
    if suf:
        word = word[: -len(suf)]
    else:
        # reflexive
        for s in ("ся", "сь"):
            if word.endswith(s) and len(word) - 2 >= rv:
                word = word[:-2]
                break
        suf = _ru_fire(word, rv, _RU_ADJECTIVE)
        if suf:
            word = word[: -len(suf)]
            psuf = _ru_fire(word, rv, _RU_PARTICIPLE_2) or _ru_fire(
                word, rv, _RU_PARTICIPLE_1, precede="ая"
            )
            if psuf:
                word = word[: -len(psuf)]
        else:
            vsuf = _ru_fire(word, rv, _RU_VERB_2) or _ru_fire(
                word, rv, _RU_VERB_1, precede="ая"
            )
            if vsuf:
                word = word[: -len(vsuf)]
            else:
                nsuf = _ru_fire(word, rv, _RU_NOUN)
                if nsuf:
                    word = word[: -len(nsuf)]

    # step 2: и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # step 3: derivational (in R2)
    suf = _ends_in(word, r2, _RU_DERIVATIONAL)
    if suf:
        word = word[: -len(suf)]

    # step 4: (нн → н) OR (superlative → delete, then нн → н) OR
    # (final ь → delete) — exclusive alternatives
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    elif _ru_fire(word, rv, _RU_SUPERLATIVE):
        suf = _ru_fire(word, rv, _RU_SUPERLATIVE)
        word = word[: -len(suf)]
        if word.endswith("нн") and len(word) - 1 >= rv:
            word = word[:-1]
    elif word.endswith("ь") and len(word) - 1 >= rv:
        word = word[:-1]
    return word


# ================================================================= FINNISH
# snowballstem.org/algorithms/finnish/stemmer.html — vowels aeiouyäö,
# restricted vowels V = aeiouäö, long vowels LV = doubled V (minus y).

_FI_VOWELS = "aeiouyäö"
_FI_V = "aeiouäö"
_FI_LV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_STEP1A = ["kin", "kaan", "kään", "ko", "kö", "han", "hän", "pa",
              "pä"]
_FI_STEP2 = ["si", "ni", "nsa", "nsä", "mme", "nne", "an", "än", "en"]
_FI_STEP3 = ["han", "hen", "hin", "hon", "hän", "hön", "siin", "den",
             "tten", "seen", "a", "ä", "tta", "ttä", "ta", "tä", "ssa",
             "ssä", "sta", "stä", "lla", "llä", "lta", "ltä", "lle",
             "na", "nä", "ksi", "ine", "n"]
_FI_STEP4 = ["mpi", "mpa", "mpä", "mmi", "mma", "mmä", "impi", "impa",
             "impä", "immi", "imma", "immä", "eja", "ejä"]


def stem_fi(word: str) -> str:
    r1 = _r1_pos(word, _FI_VOWELS)
    r2 = _r2_pos(word, _FI_VOWELS)

    # step 1: particles. sti needs R2; the k/p/h particles need a
    # preceding n, t or vowel (which need not be in R1).
    suf = _ends_in(word, r1, _FI_STEP1A + ["sti"])
    if suf == "sti":
        if len(word) - 3 >= r2:
            word = word[:-3]
    elif suf:
        prev = word[: -len(suf)]
        if prev and (prev[-1] in "nt" or prev[-1] in _FI_VOWELS):
            word = prev
    # step 2: possessives (longest match, then condition — snowball
    # among semantics: a failed condition removes nothing)
    suf = _ends_in(word, r1, _FI_STEP2)
    if suf == "si":
        if not word[:-2].endswith("k"):
            word = word[:-2]
    elif suf == "ni":
        word = word[:-2]
        if word.endswith("kse"):
            word = word[:-1] + "i"
    elif suf in ("nsa", "nsä", "mme", "nne"):
        word = word[: -len(suf)]
    elif suf == "an":
        if word[:-2].endswith(("ta", "ssa", "sta", "lla", "lta", "na")):
            word = word[:-2]
    elif suf == "än":
        if word[:-2].endswith(("tä", "ssä", "stä", "llä", "ltä", "nä")):
            word = word[:-2]
    elif suf == "en":
        if word[:-2].endswith(("lle", "ine")):
            word = word[:-2]

    # step 3: cases
    step3 = False
    suf = _ends_in(word, r1, _FI_STEP3)
    if suf in ("han", "hen", "hin", "hon", "hän", "hön"):
        if word[: -3].endswith(suf[1]):
            word = word[:-3]
            step3 = True
    elif suf in ("siin", "den", "tten"):
        prev = word[: -len(suf)]
        if len(prev) >= 2 and prev[-1] == "i" and prev[-2] in _FI_V:
            word = prev
            step3 = True
    elif suf == "seen":
        if word[:-4].endswith(_FI_LV):
            word = word[:-4]
            step3 = True
    elif suf in ("a", "ä"):
        prev = word[:-1]
        if (len(prev) >= 2 and prev[-1] in _FI_VOWELS
                and prev[-2] not in _FI_VOWELS):
            word = prev
            step3 = True
    elif suf in ("tta", "ttä"):
        if word[:-3].endswith("e"):
            word = word[:-3]
            step3 = True
    elif suf == "n":
        word = word[:-1]
        step3 = True
        if word.endswith(_FI_LV) or word.endswith("ie"):
            word = word[:-1]
    elif suf:
        word = word[: -len(suf)]
        step3 = True

    # step 4: other endings (R2)
    suf = _ends_in(word, r2, _FI_STEP4)
    if suf in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
        if not word[: -len(suf)].endswith("po"):
            word = word[: -len(suf)]
    elif suf:
        word = word[: -len(suf)]

    # step 5: plurals
    if step3:
        if len(word) - 1 >= r1 and word and word[-1] in "ij":
            word = word[:-1]
    else:
        if (len(word) - 1 >= r1 and word.endswith("t")
                and len(word) >= 2 and word[-2] in _FI_VOWELS):
            word = word[:-1]
            suf = _ends_in(word, r2, ["mma", "imma"])
            if suf == "imma":
                word = word[:-4]
            elif suf == "mma" and not word[:-3].endswith("po"):
                word = word[:-3]

    # step 6: tidying (a-d restricted to R1 — the tested letters must
    # all lie inside R1; e is unrestricted)
    if len(word) - 2 >= r1 and word.endswith(_FI_LV):
        word = word[:-1]
    if (len(word) - 2 >= r1 and len(word) >= 2
            and word[-1] in "aäei" and word[-2] not in _FI_VOWELS):
        word = word[:-1]
    if len(word) - 2 >= r1 and word.endswith(("oj", "uj")):
        word = word[:-1]
    if len(word) - 2 >= r1 and word.endswith("jo"):
        word = word[:-1]
    # e) final double consonant followed by zero or more vowels
    i = len(word) - 1
    while i >= 0 and word[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and word[i] not in _FI_VOWELS and word[i - 1] == word[i]:
        word = word[:i] + word[i + 1:]
    return word
