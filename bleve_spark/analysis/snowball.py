"""Snowball stemmers, pure-Python ports of the PUBLISHED Snowball
algorithms (snowballstem.org) for the languages whose reference
analyzers use snowballstem (analysis/lang/*/stemmer_*.go wire
SnowballStemmerName): russian, dutch, swedish, danish, norwegian,
finnish, hungarian, romanian, turkish, and english (porter2 — the
"stemmer_en_snowball" filter, distinct from porter1).

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


# ================================================================ HUNGARIAN
# Port of the published Snowball Hungarian algorithm (Anna Tordai,
# snowballstem.org/algorithms/hungarian/stemmer.html); the reference
# wires it via analysis/lang/hu/stemmer_hu.go -> snowballstem/hungarian.
# Suffix tables reconstructed from the published description; validated
# against the reference's analyzer_hu_test.go vectors and hand-traced
# cases (full-vocabulary parity is not verifiable offline).

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
# doubled consonants (incl. doubled digraphs written with one extra
# leading letter: ccs = cs+cs, ggy = gy+gy, ...)
_HU_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)
_HU_CASE = (
    "ban ben ba be ra re nak nek val vel tól től ról ről ból ből hoz "
    "hez höz nál nél ig at et ot öt ért képp képpen kor ul ül vá vé "
    "onként enként anként ként en on an ön n t".split()
)
_HU_PLUR_OWNER_DEL = (
    "jaim jeim aim eim im jaid jeid aid eid id jai jei ai ei i jaink "
    "jeink aink eink ink jaitok jeitek aitok eitek itek jeik jaik aik "
    "eik ik".split()
)
_HU_PLUR_OWNER_A = "áim áid ái áink áitok áik".split()
_HU_PLUR_OWNER_E = "éim éid éi éink éitek éik".split()
_HU_SING_OWNER_DEL = (
    "ünk unk nk juk jük uk ük em om am m od ed ad öd d ja je a e o"
    .split()
)
_HU_SING_OWNER_A = "ánk ájuk ám ád á".split()
_HU_SING_OWNER_E = "énk éjük ém éd é".split()
_HU_OWNED_DEL = "aké eké oké öké ké éi é".split()
_HU_OWNED_A = "áké áéi".split()
_HU_OWNED_E = "éké ééi".split()


def _hu_r1(word: str) -> int:
    """R1: word starts with a vowel -> after the first consonant or
    digraph; starts with a consonant -> after the first vowel."""
    if not word:
        return 0
    if word[0] in _HU_VOWELS:
        for i in range(1, len(word)):
            if word[i] not in _HU_VOWELS:
                for d in _HU_DIGRAPHS:
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
        return len(word)
    for i in range(1, len(word)):
        if word[i] in _HU_VOWELS:
            return i + 1
    return len(word)


def _hu_undouble(word: str) -> str:
    """Remove one member of a final doubled consonant (ccs -> cs,
    ll -> l)."""
    for d in _HU_DOUBLES:
        if word.endswith(d):
            if len(d) == 3:  # doubled digraph: drop the extra letter
                return word[:-3] + d[1:]
            return word[:-1]
    return word


def _hu_v_ending(word: str) -> str:
    if word.endswith("á"):
        return word[:-1] + "a"
    if word.endswith("é"):
        return word[:-1] + "e"
    return word


def stem_hu(word: str) -> str:
    r1 = _hu_r1(word)

    # 1. instrumental case: al/el preceded by a doubled consonant
    s = _ends_in(word, r1, ("al", "el"))
    if s and any(word[: -len(s)].endswith(d) for d in _HU_DOUBLES):
        word = _hu_undouble(word[: -len(s)])
        r1 = min(r1, len(word))
    # 2. frequent cases, then á/é -> a/e
    s = _ends_in(word, r1, _HU_CASE)
    if s:
        word = _hu_v_ending(word[: -len(s)])
    # 3. special cases
    s = _ends_in(word, r1, ("én", "án", "ánként"))
    if s:
        word = word[: -len(s)] + ("e" if s == "én" else "a")
    # 4. other cases
    s = _ends_in(word, r1, ("astul", "estül", "ástul", "éstül",
                            "stul", "stül"))
    if s:
        word = word[: -len(s)]
        if s == "ástul":
            word += "a"
        elif s == "éstül":
            word += "e"
    # 5. factive case: á/é preceded by doubled consonant
    s = _ends_in(word, r1, ("á", "é"))
    if s and any(word[:-1].endswith(d) for d in _HU_DOUBLES):
        word = _hu_undouble(word[:-1])
    # 6. owned
    s = _ends_in(word, r1, _HU_OWNED_DEL + _HU_OWNED_A + _HU_OWNED_E)
    if s:
        word = word[: -len(s)]
        if s in _HU_OWNED_A:
            word += "a"
        elif s in _HU_OWNED_E:
            word += "e"
    # 7. singular owner suffixes
    s = _ends_in(word, r1,
                 _HU_SING_OWNER_DEL + _HU_SING_OWNER_A + _HU_SING_OWNER_E)
    if s:
        word = word[: -len(s)]
        if s in _HU_SING_OWNER_A:
            word += "a"
        elif s in _HU_SING_OWNER_E:
            word += "e"
    # 8. plural owner suffixes
    s = _ends_in(word, r1,
                 _HU_PLUR_OWNER_DEL + _HU_PLUR_OWNER_A + _HU_PLUR_OWNER_E)
    if s:
        word = word[: -len(s)]
        if s in _HU_PLUR_OWNER_A:
            word += "a"
        elif s in _HU_PLUR_OWNER_E:
            word += "e"
    # 9. plural
    s = _ends_in(word, r1, ("ák", "ék", "ök", "ok", "ek", "ak", "k"))
    if s:
        word = word[: -len(s)]
        if s == "ák":
            word += "a"
        elif s == "ék":
            word += "e"
    return word


# ================================================================= ROMANIAN
# Port of the published Snowball Romanian algorithm
# (snowballstem.org/algorithms/romanian/stemmer.html); the reference
# wires it via analysis/lang/ro/stemmer_ro.go -> snowballstem/romanian.
# Uses the cedilla forms ş (U+015F) / ţ (U+0163) like the original
# algorithm and the reference's test vectors. Verb-suffix tables
# reconstructed from the published description; validated against
# analyzer_ro_test.go vectors and hand-traced cases.

_RO_VOWELS = "aăâeiîou"

_RO_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i",  # unless preceded by 'ab'
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}
_RO_COMBO = {}
for _sfx in ("abilitate", "abilitati", "abilităi", "abilităţi"):
    _RO_COMBO[_sfx] = "abil"
_RO_COMBO["ibilitate"] = "ibil"
for _sfx in ("ivitate", "ivitati", "ivităi", "ivităţi"):
    _RO_COMBO[_sfx] = "iv"
for _sfx in ("icitate", "icitati", "icităi", "icităţi", "icator",
             "icatori", "iciv", "iciva", "icive", "icivi", "icivă",
             "ical", "icala", "icale", "icali", "icală"):
    _RO_COMBO[_sfx] = "ic"
for _sfx in ("ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
             "atoare", "ator", "atori", "ătoare", "ător", "ători"):
    _RO_COMBO[_sfx] = "at"
for _sfx in ("itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
             "itoare", "itor", "itori"):
    _RO_COMBO[_sfx] = "it"

_RO_STEP2_DEL = (
    "at ata ată ati ate ut uta ută uti ute it ita ită iti ite ic ica "
    "ice ici ică abil abila abile abili abilă ibil ibila ibile ibili "
    "ibilă oasa oasă oase os osi oşi ant anta ante anti antă ator "
    "atori itate itati ităi ităţi iv iva ive ivi ivă".split()
)
_RO_STEP2_IUNE = ("iune", "iuni")     # delete if preceded by ţ; ţ -> t
_RO_STEP2_IST = (
    "işti istă isti iste ista ist isme ism".split()
)  # -> ist

# verb suffixes, group A: delete if preceded in RV by a consonant or u
_RO_VERB_A = (
    "are ere ire âre ui âi "
    "aşi seşi aseşi seseşi iseşi useşi âseşi "
    "ai eai iai sei "
    "aţi eaţi iaţi seţi aseţi seseţi iseţi useţi âseţi "
    "am eam iam sem asem sesem isem usem âsem "
    "au eau iau "
    "ase sese ise use âse".split()
)
# group B: delete unconditionally (in RV)
_RO_VERB_B = (
    "ăm em im âm eţi iţi âţi "
    "ez ezi ează eze "
    "esc eşti eşte ăsc ăşti ăşte "
    "ând ind ându indu".split()
)

_RO_STEP4 = ("ie", "a", "e", "i", "ă")


def _ro_rv(word: str) -> int:
    """Spanish-style RV (the Romanian algorithm shares the definition)."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _RO_VOWELS:
        for i in range(2, n):
            if word[i] in _RO_VOWELS:
                return i + 1
        return n
    if word[0] in _RO_VOWELS and word[1] in _RO_VOWELS:
        for i in range(2, n):
            if word[i] not in _RO_VOWELS:
                return i + 1
        return n
    return 3


def stem_ro(word: str) -> str:
    # prelude: i / u between vowels -> markers I / U (undone at the end)
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if (chars[i] in "iu" and chars[i - 1] in _RO_VOWELS
                and chars[i + 1] in _RO_VOWELS):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    r1 = _r1_pos(word, _RO_VOWELS)
    r2 = _r2_pos(word, _RO_VOWELS)
    rv = _ro_rv(word)

    # step 0: removal of plurals / articles (R1)
    s = _ends_in(word, r1, _RO_STEP0.keys())
    if s and not (s == "ile" and word.endswith("abile")):
        word = word[: -len(s)] + _RO_STEP0[s]

    # step 1: reduction of combining suffixes (R1, repeat)
    standard_removed = False
    while True:
        s = _ends_in(word, r1, _RO_COMBO.keys())
        if not s:
            break
        word = word[: -len(s)] + _RO_COMBO[s]
        standard_removed = True

    # step 2: removal of standard suffixes (R2)
    s = _ends_in(word, r2,
                 _RO_STEP2_DEL + list(_RO_STEP2_IUNE) + _RO_STEP2_IST)
    if s:
        if s in _RO_STEP2_IUNE:
            if word[: -len(s)].endswith("ţ"):
                word = word[: -len(s) - 1] + "t"
                standard_removed = True
        elif s in _RO_STEP2_IST:
            word = word[: -len(s)] + "ist"
            standard_removed = True
        else:
            word = word[: -len(s)]
            standard_removed = True

    # step 3: verb suffixes (RV), only if steps 1-2 removed nothing
    if not standard_removed:
        s = _ends_in(word, rv, _RO_VERB_A + _RO_VERB_B)
        if s:
            if s in _RO_VERB_B:
                word = word[: -len(s)]
            else:
                prev = len(word) - len(s) - 1
                if (prev >= rv
                        and (word[prev] not in _RO_VOWELS
                             or word[prev] == "u")):
                    word = word[: -len(s)]

    # step 4: final vowel (RV)
    s = _ends_in(word, rv, _RO_STEP4)
    if s:
        word = word[: -len(s)]

    return word.replace("I", "i").replace("U", "u")


# ================================================================== TURKISH
# Port of the published Snowball Turkish algorithm (Evren Kapusuz
# Çilden, snowballstem.org/algorithms/turkish/stemmer.html); the
# reference wires it via analysis/lang/tr/stemmer_tr.go ->
# snowballstem/turkish. The algorithm strips nominal-verb suffixes,
# then noun suffixes (possessive / case / plural chains), each guarded
# by a vowel-harmony check and optional buffer letters (y n s / high
# vowel U), then devoices a final b/c/d/ğ and appends a harmonizing
# high vowel to stems ending in d/g. Suffix chain structure
# reconstructed from the published description; validated against the
# reference's stemmer_tr_test.go vectors and hand-traced cases.

_TR_VOWELS = "aeıiouöü"
_TR_U = "ıiuü"
# vowel-harmony classes: last vowel -> set an earlier vowel must hit
_TR_HARMONY = {
    "a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
    "o": "ou", "u": "ou", "ö": "öü", "ü": "öü",
}


def _tr_harmony_ok(word: str) -> bool:
    """check_vowel_harmony: the word's LAST vowel (the suffix vowel)
    must be preceded somewhere by a vowel of its harmony class."""
    i = len(word) - 1
    while i >= 0 and word[i] not in _TR_VOWELS:
        i -= 1
    if i < 0:
        return False
    allowed = _TR_HARMONY[word[i]]
    j = i - 1
    while j >= 0:
        if word[j] in allowed:
            return True
        j -= 1
    return False


def _tr_strip(word: str, suffixes, harmony=True, opt_cons="",
              opt_U=False):
    """Match the longest of ``suffixes`` at the end of ``word`` (with
    vowel-harmony check against the full word), plus an optional
    buffer letter:

    - ``opt_cons``: one of y/n/s — consumed when present AND preceded
      by a vowel; when absent the suffix must follow a consonant
      (buffer consonants are mandatory after vowel-final stems).
    - ``opt_U``: a high vowel ı/i/u/ü — consumed when present AND
      preceded by a consonant; when absent the suffix must follow a
      vowel.

    Returns the stripped word or None."""
    if harmony and not _tr_harmony_ok(word):
        return None
    best = None
    for s in suffixes:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    if best is None or len(best) >= len(word):
        return None
    rest = word[: -len(best)]
    if opt_cons:
        if rest.endswith(opt_cons) and len(rest) >= 2 \
                and rest[-2] in _TR_VOWELS:
            return rest[:-1]
        if rest[-1] in _TR_VOWELS:
            return None
        return rest
    if opt_U:
        if rest[-1] in _TR_U and len(rest) >= 2 \
                and rest[-2] not in _TR_VOWELS:
            return rest[:-1]
        if rest[-1] not in _TR_VOWELS:
            return None
        return rest
    return rest


# --- suffix classes (each returns stripped word or None) ---

def _tr_possessives(w):
    return _tr_strip(w, ("m", "n", "mız", "miz", "muz", "müz",
                         "nız", "niz", "nuz", "nüz"), opt_U=True)


def _tr_sU(w):
    return _tr_strip(w, tuple(_TR_U), opt_cons="s")


def _tr_lArI(w):
    return _tr_strip(w, ("leri", "ları"), harmony=False)


def _tr_yU(w):
    return _tr_strip(w, tuple(_TR_U), opt_cons="y")


def _tr_nU(w):
    return _tr_strip(w, ("nı", "ni", "nu", "nü"))


def _tr_nUn(w):
    return _tr_strip(w, ("ın", "in", "un", "ün"), opt_cons="n")


def _tr_yA(w):
    return _tr_strip(w, ("a", "e"), opt_cons="y")


def _tr_nA(w):
    return _tr_strip(w, ("na", "ne"))


def _tr_DA(w):
    return _tr_strip(w, ("da", "de", "ta", "te"))


def _tr_nDA(w):
    return _tr_strip(w, ("nda", "nde", "nta", "nte"))


def _tr_DAn(w):
    return _tr_strip(w, ("dan", "den", "tan", "ten"))


def _tr_nDAn(w):
    return _tr_strip(w, ("ndan", "nden", "ntan", "nten"))


def _tr_ylA(w):
    return _tr_strip(w, ("la", "le"), opt_cons="y")


def _tr_ki(w):
    return w[:-2] if w.endswith("ki") and len(w) > 2 else None


def _tr_ncA(w):
    return _tr_strip(w, ("ca", "ce"), opt_cons="n")


# nominal verb suffixes
def _tr_ymUs(w):
    return _tr_strip(w, ("mış", "miş", "muş", "müş"), opt_cons="y")


def _tr_sUn(w):
    return _tr_strip(w, ("sın", "sin", "sun", "sün"))


def _tr_yUm(w):
    return _tr_strip(w, ("ım", "im", "um", "üm"), opt_cons="y")


def _tr_yUz(w):
    return _tr_strip(w, ("ız", "iz", "uz", "üz"), opt_cons="y")


def _tr_sUnUz(w):
    return _tr_strip(w, ("sınız", "siniz", "sunuz", "sünüz"))


def _tr_lAr(w):
    return _tr_strip(w, ("ler", "lar"))


def _tr_nUz(w):
    return _tr_strip(w, ("nız", "niz", "nuz", "nüz"))


def _tr_DUr(w):
    return _tr_strip(w, ("tır", "tir", "tur", "tür",
                         "dır", "dir", "dur", "dür"))


def _tr_cAsInA(w):
    return _tr_strip(w, ("casına", "cesine"), harmony=False)


_TR_YDU_SUFFIXES = tuple(
    d + v + p
    for d in "td" for v in "ıiuü" for p in ("m", "k", "n", "nız",
                                            "niz", "nuz", "nüz", "")
)


def _tr_yDU(w):
    return _tr_strip(w, _TR_YDU_SUFFIXES, opt_cons="y")


_TR_YSA_SUFFIXES = tuple(
    "s" + v + p
    for v in "ae" for p in ("m", "n", "k", "nız", "niz", "")
)


def _tr_ysA(w):
    return _tr_strip(w, _TR_YSA_SUFFIXES, opt_cons="y")


def _tr_yken(w):
    return _tr_strip(w, ("ken",), opt_cons="y")


def _first(w, *marks):
    for m in marks:
        r = m(w)
        if r is not None:
            return r
    return None


def _tr_nominal_verb_suffixes(word):
    """Returns (word, continue_with_noun_suffixes)."""
    r = _first(word, _tr_ymUs, _tr_yDU, _tr_ysA, _tr_yken)
    if r is not None:
        return r, True
    r = _tr_cAsInA(word)
    if r is not None:
        r2 = _first(r, _tr_sUnUz, _tr_lAr, _tr_yUm, _tr_sUn, _tr_yUz)
        if r2 is not None:
            r = r2
        r2 = _tr_ymUs(r)
        return (r2 if r2 is not None else r), True
    r = _tr_lAr(word)
    if r is not None:
        r2 = _first(r, _tr_DUr, _tr_yDU, _tr_ysA, _tr_ymUs)
        if r2 is not None:
            return r2, False
        return r, False
    r = _tr_nUz(word)
    if r is not None:
        r2 = _first(r, _tr_yDU, _tr_ysA)
        if r2 is not None:
            return r2, True
        return word, True  # nUz alone is not a nominal verb suffix
    r = _first(word, _tr_sUnUz, _tr_yUz, _tr_sUn, _tr_yUm)
    if r is not None:
        r2 = _tr_ymUs(r)
        return (r2 if r2 is not None else r), True
    r = _tr_DUr(word)
    if r is not None:
        r2 = _first(r, _tr_sUnUz, _tr_lAr, _tr_yUm, _tr_sUn, _tr_yUz)
        if r2 is not None:
            r3 = _tr_ymUs(r2)
            if r3 is not None:
                return r3, True
        return r, True
    return word, True


def _tr_chain_after_ki(word):
    r = _tr_DA(word)
    if r is not None:
        r2 = _tr_lAr(r)
        if r2 is not None:
            return _tr_chain_after_ki(r2)
        r2 = _tr_possessives(r)
        if r2 is not None:
            r3 = _tr_lAr(r2)
            if r3 is not None:
                return _tr_chain_after_ki(r3)
            return r2
        return r
    r = _tr_nDA(word)
    if r is not None:
        r2 = _tr_lArI(r)
        if r2 is not None:
            return r2
        r2 = _tr_sU(r)
        if r2 is not None:
            r3 = _tr_ki(r2)
            if r3 is not None:
                return _tr_chain_after_ki(r3)
            return r2
        return r
    return word


def _tr_noun_suffixes(word):
    r = _tr_ki(word)
    if r is not None:
        return _tr_chain_after_ki(r)
    r = _tr_ncA(word)
    if r is not None:
        r2 = _tr_lArI(r)
        if r2 is not None:
            return r2
        r2 = _first(r, _tr_possessives, _tr_sU)
        if r2 is not None:
            r3 = _tr_lAr(r2)
            return r3 if r3 is not None else r2
        r2 = _tr_lAr(r)
        return r2 if r2 is not None else r
    # locative/ablative with possessive buffer n (bare -nI stays out
    # of the top level: it would mis-parse plan+ı as pla+nı; it is
    # only reachable through the post-possessive chains)
    r = _first(word, _tr_nDAn, _tr_nDA, _tr_nA)
    if r is not None:
        r2 = _tr_lArI(r)
        if r2 is not None:
            return r2
        r2 = _tr_sU(r)
        if r2 is not None:
            r3 = _tr_lAr(r2)
            return _tr_chain_after_ki(r3) if r3 is not None else r2
        r2 = _tr_lAr(r)
        return r2 if r2 is not None else r
    # genitive -(n)Un
    r = _tr_nUn(word)
    if r is not None:
        r2 = _tr_lArI(r)
        if r2 is not None:
            return r2
        r2 = _first(r, _tr_possessives, _tr_sU)
        if r2 is not None:
            r3 = _tr_lAr(r2)
            return r3 if r3 is not None else r2
        return r
    # bare cases / accusative / instrumental / dative vs
    # possessive / 3sg -sU: the surfaces overlap (…sı is -sI after a
    # vowel stem but bare -I after an s-final stem; …yı the mirror
    # with buffer y) — the longer effective strip wins, which is how
    # the buffer-letter rules disambiguate (arabası -> araba via sU,
    # arabayı -> araba via yU)
    r_case = _first(word, _tr_DAn, _tr_DA, _tr_ylA, _tr_yU, _tr_yA)
    r_poss = _first(word, _tr_possessives, _tr_sU)
    if r_case is not None and (r_poss is None
                               or len(r_case) <= len(r_poss)):
        r = r_case
        r2 = _tr_possessives(r)
        if r2 is not None:
            r3 = _tr_lAr(r2)
            return _tr_chain_after_ki(r3) if r3 is not None else r2
        r2 = _tr_lAr(r)
        if r2 is not None:
            return _tr_chain_after_ki(r2)
        return _tr_chain_after_ki(r)
    r = _tr_lArI(word)
    if r is not None:
        return r
    # possessives / 3sg -sU
    if r_poss is not None:
        r = r_poss
        r2 = _tr_lAr(r)
        if r2 is not None:
            return _tr_chain_after_ki(r2)
        return r
    # bare plural left over after a nominal-verb strip
    # (göz+ler+im: -im goes in the nominal stage, -ler here)
    r = _tr_lAr(word)
    if r is not None:
        return _tr_chain_after_ki(r)
    return word


def stem_tr(word: str) -> str:
    if sum(1 for ch in word if ch in _TR_VOWELS) < 2:
        return word  # more_than_one_syllable_word guard
    word, cont = _tr_nominal_verb_suffixes(word)
    if cont:
        word = _tr_noun_suffixes(word)
    # postlude: append harmonizing U to stems ending in d/g, then
    # devoice a final b/c/d/ğ
    if word and word[-1] in "dg":
        for pair, u in (("aı", "ı"), ("ei", "i"), ("ou", "u"),
                        ("öü", "ü")):
            if any(ch in pair for ch in word):
                word += u
                break
    if word:
        last = word[-1]
        repl = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(last)
        if repl:
            word = word[:-1] + repl
    return word


# ============================================================ ENGLISH (porter2)
# The "english" Snowball algorithm (porter2,
# snowballstem.org/algorithms/english/stemmer.html) — what the
# reference registers as "stemmer_en_snowball"
# (analysis/lang/en/stemmer_en_snowball.go). Distinct from the porter1
# stemmer the default `en` analyzer wires (analysis/porter.py).

_EN_VOWELS = "aeiouy"
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI = "cdeghkmnrt"
_EN_EXCEPTIONS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXCEPTIONS2 = {
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed",
}
_EN_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
    ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
    ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
    ("izer", "ize"), ("ator", "ate"), ("alli", "al"), ("bli", "ble"),
]
_EN_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ful", ""), ("ness", ""),
]
_EN_STEP4 = (
    "ement ance ence able ible ment ant ent ism ate iti ous ive ize "
    "al er ic".split()
)


def _en_is_short_syllable(w: str, i: int) -> bool:
    """Short syllable ending at index i (inclusive of the vowel at i):
    (a) vowel at i, non-vowel at i+1 not in wxY, non-vowel at i-1; or
    (b) i == 0 and vowel followed by non-vowel."""
    if i < 0 or i >= len(w) or w[i] not in _EN_VOWELS:
        return False
    if i == 0:
        return len(w) > 1 and w[1] not in _EN_VOWELS
    return (
        i + 1 < len(w)
        and w[i + 1] not in _EN_VOWELS and w[i + 1] not in "wxY"
        and w[i - 1] not in _EN_VOWELS
    )


def _en_ends_short_syllable(w: str) -> bool:
    return _en_is_short_syllable(w, len(w) - 2)


def stem_en(word: str) -> str:
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]
    if word in _EN_EXCEPTIONS:
        return _EN_EXCEPTIONS[word]
    # mark consonant-y: initial y or y after vowel
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    # R1, with the gener-/commun-/arsen- prefix exception
    r1 = None
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    if r1 is None:
        r1 = _r1_pos(word, _EN_VOWELS)
    r2 = len(word)
    for i in range(r1, len(word) - 1):
        if word[i] in _EN_VOWELS and word[i + 1] not in _EN_VOWELS:
            r2 = i + 2
            break

    # step 0: apostrophe suffixes
    for s in ("'s'", "'s", "'"):
        if word.endswith(s):
            word = word[: -len(s)]
            break
    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(c in _EN_VOWELS for c in word[:-2]):
            word = word[:-1]
    if word in _EN_EXCEPTIONS2:
        return word.replace("Y", "y")
    # step 1b
    s = _ends_in(word, 0, ("eedly", "ingly", "edly", "eed", "ing",
                           "ed"))
    if s in ("eed", "eedly"):
        if len(word) - len(s) >= r1:
            word = word[: -len(s)] + "ee"
    elif s:
        stem = word[: -len(s)]
        if any(c in _EN_VOWELS for c in stem):
            word = stem
            if word.endswith(("at", "bl", "iz")):
                word += "e"
            elif word.endswith(_EN_DOUBLES):
                word = word[:-1]
            elif r1 >= len(word) and _en_ends_short_syllable(word):
                word += "e"
    # step 1c: y -> i after a consonant that is not the first letter
    if (len(word) > 2 and word[-1] in "yY"
            and word[-2] not in _EN_VOWELS):
        word = word[:-1] + "i"
    # step 2 (R1)
    for suf, rep in _EN_STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and word[-4:-3] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and word[-3:-2] in set(_EN_LI):
                word = word[:-2]
    # step 3 (R1; ative needs R2)
    for suf, rep in _EN_STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]
    # step 4 (R2)
    s = _ends_in(word, r2, _EN_STEP4)
    if s:
        word = word[: -len(s)]
    elif word.endswith("ion") and len(word) - 3 >= r2 \
            and word[-4:-3] in ("s", "t"):
        word = word[:-3]
    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1
            and not _en_ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l") and len(word) - 1 >= r2 \
            and word[-2:-1] == "l":
        word = word[:-1]
    return word.replace("Y", "y")


# =================================================================== GERMAN
# The "german" Snowball algorithm
# (snowballstem.org/algorithms/german/stemmer.html) — the reference's
# "stemmer_de_snowball" registered variant (the default de analyzer
# wires the LIGHT stemmer instead).

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def stem_de(word: str) -> str:
    if len(word) <= 2:
        return word
    word = word.replace("ß", "ss")
    # protect u/y between vowels
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _DE_VOWELS \
                and chars[i + 1] in _DE_VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)
    vowels = _DE_VOWELS + "UY"

    r1 = _r1_pos(word, vowels)
    r1 = max(r1, 3) if len(word) >= 3 else len(word)
    r2 = _r2_pos(word, vowels)

    # step 1
    s = _ends_in(word, r1, ("em", "ern", "er", "e", "en", "es", "s"))
    if s == "s":
        if len(word) >= 2 and word[-2] in _DE_S_END:
            word = word[:-1]
    elif s in ("e", "en", "es"):
        word = word[: -len(s)]
        if word.endswith("niss"):
            word = word[:-1]
    elif s:
        word = word[: -len(s)]

    # step 2
    s = _ends_in(word, r1, ("est", "en", "er", "st"))
    if s == "st":
        if len(word) >= 6 and word[-3] in _DE_ST_END:
            word = word[:-2]
    elif s:
        word = word[: -len(s)]

    # step 3: d-suffixes
    s = _ends_in(word, r2, ("end", "ung", "isch", "lich", "heit",
                            "keit", "ig", "ik"))
    if s in ("end", "ung"):
        word = word[: -len(s)]
        if (word.endswith("ig") and len(word) - 2 >= r2
                and word[-3:-2] != "e"):
            word = word[:-2]
    elif s in ("ig", "ik", "isch"):
        if word[-len(s) - 1:-len(s)] != "e":
            word = word[: -len(s)]
    elif s in ("lich", "heit"):
        word = word[: -len(s)]
        t = _ends_in(word, r1, ("er", "en"))
        if t:
            word = word[: -len(t)]
    elif s == "keit":
        word = word[:-4]
        t = _ends_in(word, r2, ("lich", "ig"))
        if t:
            word = word[: -len(t)]

    table = str.maketrans("UYäöü", "uyaou")
    return word.translate(table)


# ================================================================== SPANISH
# The "spanish" Snowball algorithm
# (snowballstem.org/algorithms/spanish/stemmer.html) — the registered
# "stemmer_es_snowball" variant (the es analyzer wires the light
# stemmer).

_ES_VOWELS = "aeiouáéíóúü"

_ES_PRON = (
    "selas selos sela selo las les los nos me se la le lo".split()
)
_ES_PRON_A = {"iéndo": "iendo", "ándo": "ando", "ár": "ar",
              "ér": "er", "ír": "ir"}
_ES_PRON_B = ("ando", "iendo", "ar", "er", "ir")

_ES_S1_DEL_R2 = (
    "amientos imientos amiento imiento anzas anza icos icas ico ica "
    "ismos ismo ables ibles able ible istas ista osos osas oso osa"
    .split()
)
_ES_S1_ADOR = (
    "aciones adoras adores ancias adora ación antes ancia ador ante"
    .split()
)
_ES_S1_IVA = ("ivas", "ivos", "iva", "ivo")
_ES_S1_IDAD = ("idades", "idad")

_ES_VERB_Y = (
    "yeron yendo yamos yais ya ye yan yen yas yes yo yó".split()
)
_ES_VERB = (
    "aríamos eríamos iríamos iéramos iésemos aríais aremos arían "
    "arías eríais eremos erían erías iríais iremos irían irías "
    "ierais ieseis asteis isteis ábamos áramos ásemos arían aría "
    "aréis erían ería eréis irían iría iréis aseis íamos emos "
    "arán arás aban aran asen aron ado ando aba ada ara ase erán "
    "erás erá eré irán irás irá iré aré ían ieran iesen ieron "
    "iendo ieras ieses abais arais íais ados idos amos imos ida "
    "ía iera iese aste iste an ían ado ido ió ar er ir as abas "
    "adas idas ías aras ieras ases ieses ís áis en es éis ad ed id"
    .split()
)
_ES_RESIDUAL = ("os", "a", "o", "á", "í", "ó")


def _es_rv(word: str) -> int:
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _ES_VOWELS:
        for i in range(2, n):
            if word[i] in _ES_VOWELS:
                return i + 1
        return n
    if word[0] in _ES_VOWELS and word[1] in _ES_VOWELS:
        for i in range(2, n):
            if word[i] not in _ES_VOWELS:
                return i + 1
        return n
    return 3


def stem_es(word: str) -> str:
    r1 = _r1_pos(word, _ES_VOWELS)
    r2 = _r2_pos(word, _ES_VOWELS)
    rv = _es_rv(word)

    # step 0: attached pronoun — strip it when preceded (in RV) by a
    # gerund/infinitive ending; accented endings lose the accent
    p = _ends_in(word, 0, _ES_PRON)
    if p:
        base = word[: -len(p)]
        for suf, rep in _ES_PRON_A.items():
            if base.endswith(suf) and len(base) - len(suf) >= rv:
                word = base[: -len(suf)] + rep
                break
        else:
            for suf in _ES_PRON_B:
                if base.endswith(suf) and len(base) - len(suf) >= rv:
                    word = base
                    break
            else:
                if base.endswith("yendo") and base[-6:-5] == "u" \
                        and len(base) - 5 >= rv:
                    word = base

    changed = False
    # step 1: standard suffixes
    s = _ends_in(
        word, 0,
        _ES_S1_DEL_R2 + _ES_S1_ADOR + list(_ES_S1_IVA)
        + list(_ES_S1_IDAD)
        + ["logías", "logía", "uciones", "ución", "encias", "encia",
           "amente", "mente"],
    )
    if s:
        start = len(word) - len(s)
        if s in _ES_S1_DEL_R2 and start >= r2:
            word = word[:start]
            changed = True
        elif s in _ES_S1_ADOR and start >= r2:
            word = word[:start]
            changed = True
            if word.endswith("ic") and len(word) - 2 >= r2:
                word = word[:-2]
        elif s in ("logías", "logía") and start >= r2:
            word = word[:start] + "log"
            changed = True
        elif s in ("uciones", "ución") and start >= r2:
            word = word[:start] + "u"
            changed = True
        elif s in ("encias", "encia") and start >= r2:
            word = word[:start] + "ente"
            changed = True
        elif s == "amente" and start >= r1:
            word = word[:start]
            changed = True
            if word.endswith("iv") and len(word) - 2 >= r2:
                word = word[:-2]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
            else:
                for t in ("os", "ic", "ad"):
                    if word.endswith(t) and len(word) - 2 >= r2:
                        word = word[:-2]
                        break
        elif s == "mente" and start >= r2:
            word = word[:start]
            changed = True
            for t in ("ante", "able", "ible"):
                if word.endswith(t) and len(word) - 4 >= r2:
                    word = word[:-4]
                    break
        elif s in _ES_S1_IDAD and start >= r2:
            word = word[:start]
            changed = True
            for t in ("abil", "ic", "iv"):
                if word.endswith(t) and len(word) - len(t) >= r2:
                    word = word[: -len(t)]
                    break
        elif s in _ES_S1_IVA and start >= r2:
            word = word[:start]
            changed = True
            if word.endswith("at") and len(word) - 2 >= r2:
                word = word[:-2]

    # step 2a: verb suffixes beginning y (only if step 1 did nothing)
    if not changed:
        s = _ends_in(word, rv, _ES_VERB_Y)
        if s and word[-len(s) - 1: -len(s)] == "u":
            word = word[: -len(s)]
            changed = True
    # step 2b: other verb suffixes
    if not changed:
        s = _ends_in(word, rv, _ES_VERB)
        if s:
            word = word[: -len(s)]
            if s in ("en", "es", "éis", "emos") \
                    and word.endswith("gu"):
                word = word[:-1]

    # step 3: residual suffix
    s = _ends_in(word, rv, _ES_RESIDUAL)
    if s:
        word = word[: -len(s)]
    elif word.endswith(("e", "é")):
        if len(word) - 1 >= rv:
            word = word[:-1]
            if word.endswith("gu") and len(word) - 1 >= rv:
                word = word[:-1]

    return word.translate(str.maketrans("áéíóú", "aeiou"))


# ================================================================== ITALIAN
# The "italian" Snowball algorithm
# (snowballstem.org/algorithms/italian/stemmer.html) — the registered
# "stemmer_it_snowball" variant (the it analyzer wires the light
# stemmer).

_IT_VOWELS = "aeiouàèìòù"

_IT_PRON = (
    "gliela gliele glieli glielo gliene mela mele meli melo mene "
    "tela tele teli telo tene cela cele celi celo cene vela vele "
    "veli velo vene gli ci la le li lo mi ne si ti vi".split()
)
_IT_S1_DEL_R2 = (
    "atrice atrici abile abili ibile ibili mente anza anze iche ichi "
    "ismo ismi ista iste isti istà istè istì ante anti ico ici ica "
    "ice oso osi osa ose".split()
)
_IT_VERB = (
    "erebbero irebbero assero assimo eremmo iremmo iscano iscono "
    "issero arono erono avamo avano avate eranno erebbe ereste "
    "eresti eremo erete essero iranno irebbe ireste iresti iremo "
    "irete irono ivamo ivano ivate ammo ando asse assi emmo enda "
    "ende endi endo erai erei Yamo iamo immo irai irei isca isce "
    "isci isco ano are ata ate ati ato ava avi avo erà ere erò ete "
    "eva evi evo irà ire irò ita ite iti ito iva ivi ivo ono uta "
    "ute uti uto ar ir".split()
)


def _it_prelude(word: str) -> str:
    word = word.translate(str.maketrans("áéíóú", "àèìòù"))
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
    for i in range(1, len(chars) - 1):
        if chars[i] in "ui" and chars[i - 1] in _IT_VOWELS \
                and chars[i + 1] in _IT_VOWELS:
            chars[i] = chars[i].upper()
    return "".join(chars)


def stem_it(word: str) -> str:
    word = _it_prelude(word)
    vowels = _IT_VOWELS
    r1 = _r1_pos(word, vowels)
    r2 = _r2_pos(word, vowels)
    n = len(word)
    if n < 3:
        rv = n
    elif word[1] not in vowels:
        rv = n
        for i in range(2, n):
            if word[i] in vowels:
                rv = i + 1
                break
    elif word[0] in vowels and word[1] in vowels:
        rv = n
        for i in range(2, n):
            if word[i] not in vowels:
                rv = i + 1
                break
    else:
        rv = 3

    # step 0: attached pronoun after ando/endo (delete) or ar/er/ir
    # (replace with e), ending in RV
    p = _ends_in(word, 0, _IT_PRON)
    if p:
        base = word[: -len(p)]
        for suf in ("ando", "endo"):
            if base.endswith(suf) and len(base) - len(suf) >= rv:
                word = base
                break
        else:
            for suf in ("ar", "er", "ir"):
                if base.endswith(suf) and len(base) - len(suf) >= rv:
                    word = base + "e"
                    break

    changed = False
    # step 1: standard suffixes
    s = _ends_in(
        word, 0,
        _IT_S1_DEL_R2
        + ["azione", "azioni", "atore", "atori", "logia", "logie",
           "uzione", "uzioni", "usione", "usioni", "enza", "enze",
           "amento", "amenti", "imento", "imenti", "amente", "ità",
           "ivo", "ivi", "iva", "ive"],
    )
    if s:
        start = len(word) - len(s)
        if s == "amente" and start >= r1:
            word = word[:start]
            changed = True
            if word.endswith("iv") and len(word) - 2 >= r2:
                word = word[:-2]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
            else:
                for t in ("os", "ic", "abil"):
                    if word.endswith(t) and len(word) - len(t) >= r2:
                        word = word[: -len(t)]
                        break
        elif s in ("amento", "amenti", "imento", "imenti") \
                and start >= rv:
            word = word[:start]
            changed = True
        elif s in _IT_S1_DEL_R2 and start >= r2:
            word = word[:start]
            changed = True
        elif s in ("azione", "azioni", "atore", "atori") \
                and start >= r2:
            word = word[:start]
            changed = True
            if word.endswith("ic") and len(word) - 2 >= r2:
                word = word[:-2]
        elif s in ("logia", "logie") and start >= r2:
            word = word[:start] + "log"
            changed = True
        elif s in ("uzione", "uzioni", "usione", "usioni") \
                and start >= r2:
            word = word[:start] + "u"
            changed = True
        elif s in ("enza", "enze") and start >= r2:
            word = word[:start] + "ente"
            changed = True
        elif s == "ità" and start >= r2:
            word = word[:start]
            changed = True
            for t in ("abil", "ic", "iv"):
                if word.endswith(t) and len(word) - len(t) >= r2:
                    word = word[: -len(t)]
                    break
        elif s in ("ivo", "ivi", "iva", "ive") and start >= r2:
            word = word[:start]
            changed = True
            if word.endswith("at") and len(word) - 2 >= r2:
                word = word[:-2]
                if word.endswith("ic") and len(word) - 2 >= r2:
                    word = word[:-2]

    # step 2: verb suffixes (only if step 1 removed nothing)
    if not changed:
        s = _ends_in(word, rv, _IT_VERB)
        if s:
            word = word[: -len(s)]

    # step 3a: final vowel (and a following i) in RV
    s = _ends_in(word, rv, ("a", "e", "i", "o", "à", "è", "ì", "ò"))
    if s:
        word = word[:-1]
        if word.endswith("i") and len(word) - 1 >= rv:
            word = word[:-1]
    # step 3b
    if len(word) - 1 >= rv and word.endswith(("ch", "gh")):
        word = word[:-1]

    return word.translate(str.maketrans("UI", "ui"))


# =================================================================== FRENCH
# The "french" Snowball algorithm
# (snowballstem.org/algorithms/french/stemmer.html) — the registered
# "stemmer_fr_snowball" variant (the fr analyzer wires the light
# stemmer).

_FR_VOWELS = "aeiouyâàëéêèïîôûù"

_FR_S1_DEL_R2 = (
    "iqUes ances ismes ables istes ance iqUe isme able iste eux"
    .split()
)
_FR_S1_ATEUR = ("atrices", "ateurs", "ations", "atrice", "ateur",
                "ation")
_FR_2A = (
    "issaIent issantes issants issante issions issiez issons isses "
    "issent issait issais isse issez îtes irions iraIent iraient "
    "iriez irons iront irent irais irait isses îmes irez iras irai "
    "ira ies ir is it ît ie i".split()
)
_FR_2B_ER = (
    "eraIent eraient erions assiez assions èrent erais erait eras "
    "erez eriez erons eront ées era erai iez ée és er ez é".split()
)
_FR_2B_A = (
    "assent aIent aient antes asses âmes âtes ante ants asse ais "
    "ait ant ât as ai a".split()
)


def _fr_prelude(word: str) -> str:
    chars = list(word)
    n = len(chars)
    i = 0
    while i < n:
        c = chars[i]
        if c in _FR_VOWELS and c not in "UIY":
            if i + 2 < n and chars[i + 1] == "u" \
                    and chars[i + 2] in _FR_VOWELS:
                chars[i + 1] = "U"
            elif i + 2 < n and chars[i + 1] == "i" \
                    and chars[i + 2] in _FR_VOWELS:
                chars[i + 1] = "I"
            elif i + 1 < n and chars[i + 1] == "y":
                chars[i + 1] = "Y"
        if c == "y" and i + 1 < n and chars[i + 1] in _FR_VOWELS:
            chars[i] = "Y"
        if c == "q" and i + 1 < n and chars[i + 1] == "u":
            chars[i + 1] = "U"
        i += 1
    return "".join(chars)


def stem_fr(word: str) -> str:
    word = _fr_prelude(word)
    vowels = _FR_VOWELS

    n = len(word)
    if n >= 3 and word[0] in vowels and word[1] in vowels:
        rv = 3
    elif word[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if word[i] in vowels:
                rv = i + 1
                break
    r1 = _r1_pos(word, vowels)
    r2 = _r2_pos(word, vowels)

    changed = False
    do_2a = False

    # ---- step 1: standard suffixes ----
    s = _ends_in(
        word, 0,
        _FR_S1_DEL_R2 + list(_FR_S1_ATEUR)
        + ["logies", "logie", "usions", "utions", "usion", "ution",
           "ences", "ence", "ements", "ement", "ités", "ité",
           "ives", "ifs", "ive", "if", "eaux", "aux", "euses",
           "euse", "issements", "issement", "amment", "emment",
           "ments", "ment"],
    )
    if s:
        start = len(word) - len(s)
        if s in _FR_S1_DEL_R2 and start >= r2:
            word = word[:start]
            changed = True
        elif s in _FR_S1_ATEUR and start >= r2:
            word = word[:start]
            changed = True
            if word.endswith("ic"):
                if len(word) - 2 >= r2:
                    word = word[:-2]
                else:
                    word = word[:-2] + "iqU"
        elif s in ("logies", "logie") and start >= r2:
            word = word[:start] + "log"
            changed = True
        elif s in ("usions", "utions", "usion", "ution") \
                and start >= r2:
            word = word[:start] + "u"
            changed = True
        elif s in ("ences", "ence") and start >= r2:
            word = word[:start] + "ent"
            changed = True
        elif s in ("ements", "ement") and start >= rv:
            word = word[:start]
            changed = True
            if word.endswith("iv") and len(word) - 2 >= r2:
                word = word[:-2]
                if word.endswith("at") and len(word) - 2 >= r2:
                    word = word[:-2]
            elif word.endswith("eus"):
                if len(word) - 3 >= r2:
                    word = word[:-3]
                elif len(word) - 3 >= r1:
                    word = word[:-3] + "eux"
            elif word.endswith(("abl", "iqU")) \
                    and len(word) - 3 >= r2:
                word = word[:-3]
            elif word.endswith(("ièr", "Ièr")) \
                    and len(word) - 3 >= rv:
                word = word[:-3] + "i"
        elif s in ("ités", "ité") and start >= r2:
            word = word[:start]
            changed = True
            if word.endswith("abil"):
                if len(word) - 4 >= r2:
                    word = word[:-4]
                else:
                    word = word[:-4] + "abl"
            elif word.endswith("ic"):
                if len(word) - 2 >= r2:
                    word = word[:-2]
                else:
                    word = word[:-2] + "iqU"
            elif word.endswith("iv") and len(word) - 2 >= r2:
                word = word[:-2]
        elif s in ("ives", "ifs", "ive", "if") and start >= r2:
            word = word[:start]
            changed = True
            if word.endswith("at") and len(word) - 2 >= r2:
                word = word[:-2]
                if word.endswith("ic"):
                    if len(word) - 2 >= r2:
                        word = word[:-2]
                    else:
                        word = word[:-2] + "iqU"
        elif s == "eaux":
            word = word[:start] + "eau"
            changed = True
        elif s == "aux" and start >= r1:
            word = word[:start] + "al"
            changed = True
        elif s in ("euses", "euse"):
            if start >= r2:
                word = word[:start]
                changed = True
            elif start >= r1:
                word = word[:start] + "eux"
                changed = True
        elif s in ("issements", "issement") and start >= r1 \
                and start > 0 and word[start - 1] not in vowels:
            word = word[:start]
            changed = True
        elif s == "amment" and start >= rv:
            word = word[:start] + "ant"
            changed = True
            do_2a = True
        elif s == "emment" and start >= rv:
            word = word[:start] + "ent"
            changed = True
            do_2a = True
        elif s in ("ments", "ment") and start >= 1 \
                and word[start - 1] in vowels and start - 1 >= rv:
            word = word[:start]
            changed = True
            do_2a = True

    # ---- steps 2a / 2b: verb suffixes ----
    if not changed or do_2a:
        s = _ends_in(word, rv, _FR_2A)
        if s and len(word) - len(s) > 0 \
                and word[len(word) - len(s) - 1] not in vowels \
                and len(word) - len(s) - 1 >= rv:
            word = word[: -len(s)]
            changed = True
        elif not changed:
            # step 2b
            s = _ends_in(word, rv, ["ions"] + _FR_2B_ER + _FR_2B_A)
            if s == "ions":
                if len(word) - 4 >= r2:
                    word = word[:-4]
                    changed = True
            elif s in _FR_2B_ER:
                word = word[: -len(s)]
                changed = True
            elif s in _FR_2B_A:
                word = word[: -len(s)]
                changed = True
                if word.endswith("e") and len(word) - 1 >= rv:
                    word = word[:-1]

    if changed:
        # step 3
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4: residual suffix
        if word.endswith("s") and len(word) >= 2 \
                and word[-2] not in "aiouès":
            word = word[:-1]
        s = _ends_in(word, rv, ("Ière", "ière", "Ier", "ier", "ion",
                                "e", "ë"))
        if s == "ion":
            if len(word) - 3 >= r2 and len(word) >= 4 \
                    and word[-4] in "st":
                word = word[:-3]
        elif s in ("Ière", "ière", "Ier", "ier"):
            word = word[: -len(s)] + "i"
        elif s == "e":
            word = word[:-1]
        elif s == "ë" and word[-3:-1] == "gu":
            word = word[:-1]

    # step 5: un-double
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]
    # step 6: un-accent — é/è followed by only non-vowels to the end
    for i in range(len(word) - 1, -1, -1):
        if word[i] in vowels:
            if word[i] in "éè" and i < len(word) - 1:
                word = word[:i] + "e" + word[i + 1:]
            break

    return word.translate(str.maketrans("IUY", "iuy"))
