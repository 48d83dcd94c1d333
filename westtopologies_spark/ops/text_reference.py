"""Reference-faithful text pipeline kernels (SURVEY.md §2.8, fixture tier).

Round-1 verdict item 4: the engine's default text stages
(:mod:`.text`) are deliberately SQL-expressible simplifications so
the driver's DuckDB oracle can check them. THIS module is the
bug-compatible tier: it reproduces the reference's opaque text
kernels exactly, pinned by fixtures under ``tests/fixtures/``.

Recovered behavior (all from constant-pool/bytecode of the public
reference jar ``reveal-predict-location-0.1.jar``, class
``ckling.text.Text`` — see SURVEY.md §2.8 "[bytecode]" rows):

* ``getTerms`` is a consume-from-front loop over two ``^``-anchored
  patterns tried in order — strip (whitespace+double-quote runs, a
  URL form, ``[?!.,]+`` runs) first, then the token pattern
  (emoticon alternation | number | ``[#@]?word`` | symbol runs).
  A match is lowercased; strip matches are discarded; token matches
  are optionally stopword-filtered (``matches()`` against an
  embedded alternation regex), optionally Snowball-stemmed, truncated
  to 32 chars, and emitted. A position matching neither pattern drops
  one char. (``Text#getTerms`` bytecode, verified instruction by
  instruction.)
* the stemmer field is ``org.tartarus.snowball.ext.englishStemmer``
  — the Snowball "english" (Porter2) algorithm, the revision WITH the
  gener/commun/arsen R1 exceptions (all three literals present in the
  class constant pool). :func:`porter2_stem` implements that public
  algorithm from its published specification (snowballstem.org), not
  from the jar.
* X1 in the reference is the cybozu ``langdetect`` char-n-gram Naive
  Bayes (``TweetIndexBolt.java:95-125``): detect → drop message on
  detector error → keep ``en`` only. That detector is seeded-random;
  :class:`NGramLanguageDetector` reproduces the operator contract
  (n-gram NB scores, error ⇒ null ⇒ drop, keep-en filter)
  deterministically with profiles built at import from embedded word
  lists, so results are stable across runs and partitions.

Everything crosses the JVM/Python boundary Arrow-batched
(``pandas_udf``); there are no row-at-a-time Python UDFs.
"""

from __future__ import annotations

import math
import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# X2 — the exact getTerms patterns (ckling.text.Text constant pool).
# Kept byte-for-byte (including the reference's literal `&amp;` inside
# the URL char class — faithful bug-compatibility).
# ---------------------------------------------------------------------------

STRIP_PATTERN_REF = (
    r'^([ \t\n\x0B\f\r"]+'
    r"|(http|https|ftp)\://[a-zA-Z0-9\-\.]+\.[a-zA-Z]{2,3}(:[a-zA-Z0-9]*)?"
    r"/?([a-zA-Z0-9\-\._\?\,\'/\\\+&amp;%\$#\=~])*"
    r"|[?!\.,]+)"
)

TOKEN_PATTERN_REF = (
    r"^((:D|:-D|:P|:-P|:O|:-O|B\)|B-\)|:S|:-S|:X|:-X|XD|xD|X-D|X-\)"
    r"|8\)|8-\)|X\(|X-\(|:d|:-d|n8|w8|n1)"
    r"|[0-9]([\.:]?[0-9]+)?"
    "|[#@]?[_a-zA-ZÀ-ÖØ-öø-ž0-9']+"
    "|[‘‚¨\\\\’ ‘•0-9~®‹›*—´«»`@ł€¶ŧ←↓→øþæſðđŋħł»«¢„“”µ°!\"§$%&/()=?'_:;>¹²³¼½¬{\\[\\]}–…·|<,.\\-#+'\\^]+)"
)

# stopword alternation regexes — embedded verbatim in ckling.text.Text;
# enabled only when stopwords=true (TweetIndexBolt runs stem-only).
STOPWORD_EN_REF = (
    "^(i|me|my|myself|we|us|our|ours|ourselves|you|your|yours|yourself|yourselves|he|him|his|himself|she|her|hers|herself|it|its|itself|they|them|their|theirs|themselves|what|which|who|whom|this|that|these|those|am|is|are|was|were|be|been|being|have|has|had|having|do|does|did|doing|would|could|should|ought|might|however|will|would|shall|should|can|could|may|might|must|ought|i'm|you're|he's|she's|it's|we're|they're|i've|you've|we've|they've|i'd|you'd|he'd|she'd|we'd|they'd|i'll|you'll|he'll|she'll|we'll|they'll|isn't|aren't|wasn't|weren't|hasn't|haven't|hadn't|doesn't|don't|didn't|won't|wouldn't|shan't|shouldn't|can't|cannot|couldn't|mustn't|let's|that's|who's|what's|here's|there's|when's|where's|why's|how's|daren't|needn't|oughtn't|mightn't|a|an|the|and|but|if|or|because|as|until|while|of|at|by|for|with|about|against|between|into|through|during|before|after|above|below|to|from|up|down|in|out|on|off|over|under|again|further|then|once|here|there|when|where|why|how|all|any|both|each|few|more|most|other|some|such|no|nor|not|only|own|same|so|than|too|very)$"
)

STOPWORD_DE_REF = (
    "^(aber|alle|allem|allen|aller|alles|als|also|am|an|ander|andere|anderem|anderen|anderer|anderes|anderm|andern|anderr|anders|auch|auf|aus|bei|bin|bis|bist|da|damit|dann|der|den|des|dem|die|das|dass|daß|derselbe|derselben|denselben|desselben|demselben|dieselbe|dieselben|dasselbe|dazu|dein|deine|deinem|deinen|deiner|deines|denn|derer|dessen|dich|dir|du|dies|diese|diesem|diesen|dieser|dieses|doch|dort|durch|ein|eine|einem|einen|einer|eines|einig|einige|einigem|einigen|einiger|einiges|einmal|er|ihn|ihm|es|etwas|euer|eure|eurem|euren|eurer|eures|für|gegen|gewesen|hab|habe|haben|hat|hatte|hatten|hier|hin|hinter|ich|mich|mir|ihr|ihre|ihrem|ihren|ihrer|ihres|euch|im|in|indem|ins|ist|jede|jedem|jeden|jeder|jedes|jene|jenem|jenen|jener|jenes|jetzt|kann|kein|keine|keinem|keinen|keiner|keines|können|könnte|machen|man|manche|manchem|manchen|mancher|manches|mein|meine|meinem|meinen|meiner|meines|mit|muss|musste|nach|nicht|nichts|noch|nun|nur|ob|oder|ohne|sehr|sein|seine|seinem|seinen|seiner|seines|selbst|sich|sie|ihnen|sind|so|solche|solchem|solchen|solcher|solches|soll|sollte|sondern|sonst|über|um|und|uns|unse|unsem|unsen|unser|unses|unter|viel|vom|von|vor|während|war|waren|warst|was|weg|weil|weiter|welche|welchem|welchen|welcher|welches|wenn|werde|werden|wie|wieder|will|wir|wird|wirst|wo|wollen|wollte|würde|würden|zu|zum|zur|zwar|zwischen)$"
)

_STRIP_RE = re.compile(STRIP_PATTERN_REF)
_TOKEN_RE = re.compile(TOKEN_PATTERN_REF)
_STOP_RE = {"en": re.compile(STOPWORD_EN_REF), "de": re.compile(STOPWORD_DE_REF)}


# ---------------------------------------------------------------------------
# X4 — Snowball "english" (Porter2) stemmer, pure Python.
# Implemented from the published algorithm (snowballstem.org/algorithms/
# english/stemmer.html), the revision matching the jar's englishStemmer
# (gener/commun/arsen R1 exceptions present in its constant pool).
# ---------------------------------------------------------------------------

_VOWELS = frozenset("aeiouy")
_DOUBLES = frozenset(("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"))
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTION1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)

_STEP2 = (  # longest-match order; (suffix, replacement, extra-condition tag)
    ("ization", "ize", None),
    ("ational", "ate", None),
    ("fulness", "ful", None),
    ("ousness", "ous", None),
    ("iveness", "ive", None),
    ("tional", "tion", None),
    ("biliti", "ble", None),
    ("lessli", "less", None),
    ("entli", "ent", None),
    ("ation", "ate", None),
    ("alism", "al", None),
    ("aliti", "al", None),
    ("ousli", "ous", None),
    ("iviti", "ive", None),
    ("fulli", "ful", None),
    ("enci", "ence", None),
    ("anci", "ance", None),
    ("abli", "able", None),
    ("izer", "ize", None),
    ("ator", "ate", None),
    ("alli", "al", None),
    ("bli", "ble", None),
    ("ogi", "og", "l_before"),
    ("li", "", "li_ending"),
)

_STEP3 = (
    ("ational", "ate", None),
    ("tional", "tion", None),
    ("alize", "al", None),
    ("icate", "ic", None),
    ("iciti", "ic", None),
    ("ative", "", "in_r2"),
    ("ical", "ic", None),
    ("ness", "", None),
    ("ful", "", None),
)

_STEP4 = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "ion",
    "al",
    "er",
    "ic",
)


def _ends_short_syllable(w: str) -> bool:
    n = len(w)
    if n >= 3 and w[-2] in _VOWELS and w[-1] not in _VOWELS and w[-1] not in "wxY" and w[-3] not in _VOWELS:
        return True
    return n == 2 and w[0] in _VOWELS and w[1] not in _VOWELS


def _mark_regions(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def porter2_stem(word: str) -> str:
    """Snowball "english" stem of ``word`` (expects lowercase input,
    as ``getTerms`` lowercases before stemming)."""
    if word in _EXCEPTION1:
        return _EXCEPTION1[word]
    if len(word) < 3:
        return word

    # prelude: strip one leading apostrophe, mark consonant-y as Y
    w = word[1:] if word.startswith("'") else word
    chars = list(w)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    w = "".join(chars)

    r1, r2 = _mark_regions(w)

    # step 0 — longest of  's'  /  's  /  '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if any(c in _VOWELS for c in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTION2:
        return w

    # step 1b
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if w.endswith(suf):
            if suf in ("eed", "eedly"):
                if len(w) - len(suf) >= r1:
                    w = w[: -len(suf)] + "ee"
            else:
                stem_part = w[: -len(suf)]
                if any(c in _VOWELS for c in stem_part):
                    w = stem_part
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w[-2:] in _DOUBLES:
                        w = w[:-1]
                    elif _ends_short_syllable(w) and r1 >= len(w):
                        w += "e"
            break

    # step 1c
    if len(w) > 2 and w[-1] in "yY" and w[-2] not in _VOWELS:
        w = w[:-1] + "i"

    # step 2 (suffix must start in R1)
    for suf, repl, cond in _STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if cond == "l_before":
                    if len(w) > len(suf) and w[-len(suf) - 1] == "l":
                        w = w[: -len(suf)] + repl
                elif cond == "li_ending":
                    if len(w) > len(suf) and w[-len(suf) - 1] in _LI_ENDING:
                        w = w[: -len(suf)] + repl
                else:
                    w = w[: -len(suf)] + repl
            break

    # step 3 (in R1; 'ative' additionally requires R2)
    for suf, repl, cond in _STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if cond == "in_r2":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)] + repl
                else:
                    w = w[: -len(suf)] + repl
            break

    # step 4 (in R2; 'ion' additionally needs preceding s/t)
    for suf in _STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


# ---------------------------------------------------------------------------
# X2 — getTerms, instruction-faithful
# ---------------------------------------------------------------------------


def get_terms(
    text: str | None,
    *,
    stem: bool = True,
    stopwords: bool = False,
    lang: str = "en",
) -> list[str]:
    """Exact ``ckling.text.Text#getTerms`` loop (bytecode-verified).

    ``TweetIndexBolt.java:172-176`` runs it with ``stem=True,
    stopwords=False, lang="en"`` — the defaults here.
    """
    if text is None:
        return []
    if stem and lang != "en":
        raise NotImplementedError("only the reference's english Snowball stemmer is implemented")
    stop_re = _STOP_RE[lang] if stopwords else None
    terms: list[str] = []
    rest = text
    while rest:
        m = _STRIP_RE.match(rest)
        if m:
            rest = rest[m.end() :]
            continue
        m = _TOKEN_RE.match(rest)
        if m:
            term = m.group().lower()
            rest = rest[m.end() :]
            if stop_re is not None and stop_re.match(term):
                continue
            if stem:
                term = porter2_stem(term)
            if len(term) > 32:
                term = term[:32]
            terms.append(term)
        else:
            rest = rest[1:]
    return terms


def tokenize_reference(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    *,
    stem: bool = True,
    stopwords: bool = False,
) -> DataFrame:
    """X2+X4 reference mode as an Arrow-batched pandas UDF.

    The default :func:`..text.tokenize` stays the JVM-regex oracle
    path; this is the bug-compatible tier for users replaying the
    locationTopicModel pipeline byte-for-byte.
    """
    @F.pandas_udf(ArrayType(StringType()))
    def _terms(s: pd.Series) -> pd.Series:
        return s.map(lambda t: get_terms(t, stem=stem, stopwords=stopwords))

    return df.withColumn(out_col, _terms(F.col(text_col)))


# ---------------------------------------------------------------------------
# X1 — deterministic char-n-gram Naive Bayes language detector
# ---------------------------------------------------------------------------

# seed word lists per language. en/de are the reference's own embedded
# stopword lists (above); the rest are public high-frequency word lists
# of comparable size so profiles are balanced.
_SEED_ES = (
    "el la los las un una unos unas y o pero que de del en con por para como más pero sus este "
    "esta estos estas ese esa eso aquel se su al lo le les mi tu nos vos ya muy sin sobre también "
    "hasta donde cuando quien cual todo toda todos todas otro otra otros otras ser es son era eran "
    "fue fueron estar está están estaba hay había tiene tienen tenía hacer hace hizo puede pueden "
    "dijo años día vez vida mundo casa parte tiempo hombre mujer gobierno país contra entre durante "
    "después antes ahora aquí allí así porque aunque mientras nunca siempre nada algo alguien nadie"
).split()
_SEED_FR = (
    "le la les un une des du de en dans avec pour par sur sous vers chez et ou mais donc or ni car "
    "que qui quoi dont où ce cette ces cet se son sa ses mon ma mes ton ta tes notre votre leur nous "
    "vous ils elles il elle je tu on ne pas plus moins très bien mal tout toute tous toutes autre "
    "être est sont était étaient fut avoir a ont avait eu faire fait peut peuvent pouvait dit "
    "année jour fois vie monde maison partie temps homme femme gouvernement pays contre entre pendant "
    "après avant maintenant ici là ainsi parce aussi jamais toujours rien quelque quelqu'un personne"
).split()
_SEED_IT = (
    "il lo la i gli le un uno una e o ma che di del della in con per su come più suo sua suoi sue "
    "questo questa questi queste quello quella si al allo alla ci vi ne già molto senza sopra anche "
    "fino dove quando chi quale tutto tutta tutti tutte altro altra essere è sono era erano fu furono "
    "stare sta stanno stava avere ha hanno aveva fare fa fece può possono disse anni giorno volta "
    "vita mondo casa parte tempo uomo donna governo paese contro tra durante dopo prima adesso qui "
    "così perché anche mentre mai sempre niente qualcosa qualcuno nessuno"
).split()

# common content words so the en/de profiles (stopword-list based) are
# balanced against the content-word-rich es/fr/it seed lists
_SEED_EN_EXTRA = (
    "year day time people way world life house man woman government country thing work week "
    "school family student group company problem fact hand part place case point number night "
    "water room mother area money story month lot right study book eye job word business issue "
    "side kind head far early young important public bad same able simple english sentence "
    "quick brown jumps lazy little large great small good new first last long own other old"
).split()
_SEED_DE_EXTRA = (
    "jahr tag zeit leute weg welt leben haus mann frau regierung land sache arbeit woche "
    "schule familie gruppe firma problem hand teil ort fall punkt nummer nacht wasser zimmer "
    "mutter geld geschichte monat recht buch auge wort seite kopf weit jung wichtig schlecht "
    "gleich einfach schnell braun springt faul klein groß gut neu erste letzte lang eigene alt"
).split()

_SEED_WORDS: dict[str, list[str]] = {}


def _build_seed_words() -> dict[str, list[str]]:
    if _SEED_WORDS:
        return _SEED_WORDS
    en = STOPWORD_EN_REF[2:-2].split("|") + _SEED_EN_EXTRA
    de = STOPWORD_DE_REF[2:-2].split("|") + _SEED_DE_EXTRA
    _SEED_WORDS.update({"de": de, "en": en, "es": _SEED_ES, "fr": _SEED_FR, "it": _SEED_IT})
    return _SEED_WORDS


class NGramLanguageDetector:
    """Deterministic stand-in for the cybozu langdetect Naive Bayes.

    Same contract as ``TweetIndexBolt.java:95-125``: ``detect(text)``
    returns a language code or ``None`` (the LangDetectException path
    — too little signal), and the pipeline drops ``None`` rows then
    keeps ``en`` only. Scoring is the same family (char 1-3-gram
    Naive Bayes with additive smoothing) but profiles are embedded
    and scoring sums ALL n-grams instead of seeded random sampling,
    so output is reproducible across runs/partitions.
    """

    _shared: "NGramLanguageDetector | None" = None

    def __init__(self) -> None:
        seeds = _build_seed_words()
        self.langs = sorted(seeds)
        self.logp: dict[str, dict[str, float]] = {}
        vocab: set[str] = set()
        counts: dict[str, dict[str, int]] = {}
        for lang, words in seeds.items():
            c: dict[str, int] = {}
            for word in words:
                for g in self._ngrams(word):
                    c[g] = c.get(g, 0) + 1
                    vocab.add(g)
            counts[lang] = c
        v = len(vocab)
        for lang, c in counts.items():
            total = sum(c.values())
            denom = math.log(total + v)
            self.logp[lang] = {g: math.log(n + 1) - denom for g, n in c.items()}
            self.logp[lang]["\0"] = math.log(1) - denom  # unseen-gram mass
        self._word_re = re.compile(r"[^\W\d_]+", re.UNICODE)

    @classmethod
    def shared(cls) -> "NGramLanguageDetector":
        if cls._shared is None:
            cls._shared = cls()
        return cls._shared

    @staticmethod
    def _ngrams(word: str) -> list[str]:
        padded = f" {word} "
        out = []
        for n in (1, 2, 3):
            out.extend(padded[i : i + n] for i in range(len(padded) - n + 1))
        return out

    def detect(self, text: str | None) -> str | None:
        if text is None:
            return None
        words = self._word_re.findall(text.lower())
        grams = [g for w in words for g in self._ngrams(w)]
        if not grams:
            return None  # == LangDetectException("no features in text")
        best_lang, best_score = None, -math.inf
        for lang in self.langs:
            table = self.logp[lang]
            unseen = table["\0"]
            score = sum(table.get(g, unseen) for g in grams)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang


def detect_language_reference(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_ref"
) -> DataFrame:
    """X1 reference mode: n-gram NB detect; null = detector error."""
    @F.pandas_udf(StringType())
    def _detect(s: pd.Series) -> pd.Series:
        det = NGramLanguageDetector.shared()
        return s.map(det.detect)

    return df.withColumn(out_col, _detect(F.col(text_col)))


def keep_english_reference(df: DataFrame, text_col: str = "text") -> DataFrame:
    """TweetIndexBolt.java:154-169 — drop on detect error (null), keep
    only ``en``."""
    out = detect_language_reference(df, text_col)
    return out.filter(F.col("lang_ref") == "en")


def stopword_regex_matches(token: Column, lang: str = "en") -> Column:
    """X3 reference predicate — the embedded alternation regex, applied
    with ``matches()`` semantics (full-string), as a JVM ``rlike``."""
    pattern = {"en": STOPWORD_EN_REF, "de": STOPWORD_DE_REF}[lang]
    return token.rlike(pattern)
