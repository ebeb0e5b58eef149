"""Deterministic synthetic corpus for the entity-resolution pipeline.

Generates the driver `input_hint` shape — an interleaved text+media document
table::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

plus ground truth and fixtures (FIXTURES.md):

- ``truth_clusters(name, entity_id)`` — pairwise-F1 oracle.
- ``addresses(name, address)`` — address-verification fixture with PO-box
  variants (reference: code/functions/match_addresses.R:76-145).
- ``labeled_pairs(name, match, keep)`` — review-label fixture mirroring the
  reference's hand-labeled sample (reference:
  writeups/name_matching_outline.tex §"random forest").

Everything is seeded; same (seed, n_entities) → byte-identical tables. No
external data. Company aliases are built so that every same-entity pair is
reachable through at least one matcher channel (shared distinctive token,
Jaro-close typo, cosine, or human-name rules) and distinct entities never
share a non-common token — mirroring how the reference's matchers divide
the recall surface.
"""

from __future__ import annotations

import itertools
import os
import random
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .constants import FIRST_NAMES, NICKNAMES, STANDALONE_WORDS, SURNAMES

_SUFFIXES = ["INC", "LLC", "CORP", "LTD", "CO", "LP", "COMPANY", "CORPORATION"]
_INDUSTRY = ["OIL", "GAS", "ENERGY", "PETROLEUM", "RESOURCES", "OPERATING",
             "EXPLORATION", "PRODUCTION", "MINERALS", "PIPELINE"]
_CONS = "BCDFGHKLMNPRSTVWZ"
_VOWS = "AEIOU"

_STREETS = ["MAIN ST", "OAK AVE", "ELM ST", "COMMERCE BLVD", "ENERGY PLAZA",
            "5TH AVE", "BROADWAY", "RANCH RD", "COUNTY RD 12", "INDUSTRIAL PKWY"]
_CITIES = ["MIDLAND, TX", "HOUSTON, TX", "ODESSA, TX", "FORT WORTH, TX",
           "OKLAHOMA CITY, OK", "DENVER, CO", "TULSA, OK", "ABILENE, TX"]


def _invent_word(rng: random.Random, syllables: int) -> str:
    return "".join(
        rng.choice(_CONS) + rng.choice(_VOWS) + (rng.choice(_CONS) if rng.random() < 0.4 else "")
        for _ in range(syllables)
    )


def _distinct_words(rng: random.Random, n: int) -> list[str]:
    """Invented distinctive tokens with an enforced pairwise Jaro gap.

    The round-1 prefix-bucket filter only separated 4-char prefixes; at
    sf1's ~24k-word pool it emitted Jaro-near cross-entity word pairs
    (PINMU vs PIGNUM, jw 0.12) that are *indistinguishable in principle*
    from genuine typo aliases — an adversarially degenerate fixture, not a
    realistic corpus. Words are now ≥10-char random CVC strings rejected
    at Jaro ≥ 0.82 against every accepted word found through a 3-gram
    inverted index. A few transposition-heavy pairs sharing no 3-gram can
    still slip past the blocking (measured max ≈ 0.87 similarity in a 3k
    sample) — that residue mirrors real-world near-twin names, which are
    resolved by address/context evidence, modeled separately."""
    # Restricted alphabet: chosen so NO company-classifier keyword
    # (constants.COMPANY_KEYWORDS — substring semantics faithful to the
    # reference) can occur inside any generated word; 'OG' in particular
    # was classifying fabricated surnames as companies and blinding the
    # cross-surname screen (sf1 stress run). Excluded letters {O P T C G
    # U Y X Q J} cover every keyword; the CVC syllable structure rules out
    # the space-anchored ones (a word can never end in consonant-consonant).
    cons, vows = "BDFHKLMNRSVWZ", "AEI"
    # Near-duplicate rejection: a candidate is compared (exact Jaro)
    # against every accepted word sharing >= 3 character 3-grams — the
    # cheap blocking that catches Jaro-near pairs — and rejected at
    # similarity >= 0.82 (the typo-accept channel fires at >= 0.85). The
    # round-1 prefix filter had no such guarantee and emitted cross-entity
    # near-twins (PINMU/PIGNUM) indistinguishable from typo aliases.
    def _jaro(s1: str, s2: str) -> float:
        md = max(len(s1), len(s2)) // 2 - 1
        f1 = [False] * len(s1)
        f2 = [False] * len(s2)
        m = 0
        for i, c in enumerate(s1):
            for j in range(max(0, i - md), min(len(s2), i + md + 1)):
                if not f2[j] and s2[j] == c:
                    f1[i] = f2[j] = True
                    m += 1
                    break
        if not m:
            return 0.0
        t = 0
        j = 0
        for i in range(len(s1)):
            if f1[i]:
                while not f2[j]:
                    j += 1
                if s1[i] != s2[j]:
                    t += 1
                j += 1
        return (m / len(s1) + m / len(s2) + (m - t / 2) / m) / 3

    import re

    from .constants import COMPANY_KEYWORDS

    kw = re.compile("(?i)(" + "|".join(COMPANY_KEYWORDS) + ")")
    grams: dict[str, list[int]] = {}
    out: list[str] = []
    while len(out) < n:
        # ≥10 chars: at these lengths a Jaro-similarity ≥ 0.8 pair cannot
        # avoid sharing a character 3-gram, so the inverted-index blocking
        # below sees every dangerous candidate
        w = "".join(
            rng.choice(cons) + rng.choice(vows) + (rng.choice(cons) if rng.random() < 0.5 else "")
            for _ in range(rng.randint(4, 5))
        )
        if len(w) < 10:
            continue
        # belt-and-braces: the alphabet excludes almost every keyword, but
        # boundary-anchored ones (\sLAND) can still match at word edges
        if kw.search(f" {w} "):
            continue
        gs = {w[i : i + 3] for i in range(len(w) - 2)}
        counts: dict[int, int] = {}
        for g in gs:
            for idx in grams.get(g, ()):
                counts[idx] = counts.get(idx, 0) + 1
        # a single shared 3-gram already triggers the exact check:
        # transposition-heavy Jaro-near pairs can share as little as one
        if any(_jaro(w, out[idx]) >= 0.82 for idx in counts):
            continue
        for g in gs:
            grams.setdefault(g, []).append(len(out))
        out.append(w)
    return out


def _typo(rng: random.Random, word: str) -> str:
    """Single-character edit that keeps Jaro distance small."""
    i = rng.randrange(1, len(word))
    kind = rng.random()
    if kind < 0.4 and len(word) > 5:  # deletion
        return word[:i] + word[i + 1 :]
    if kind < 0.7:  # substitution
        return word[:i] + rng.choice(_CONS + _VOWS) + word[i + 1 :]
    if i < len(word) - 1:  # transposition
        return word[:i] + word[i + 1] + word[i] + word[i + 2 :]
    return word + rng.choice(_VOWS)


def _punct_jitter(rng: random.Random, name: str) -> str:
    toks = name.split(" ")
    out = []
    for t in toks:
        r = rng.random()
        if r < 0.12 and len(t) > 2:
            t = t + "."
        elif r < 0.18:
            t = t + ","
        out.append(t)
    s = " ".join(out)
    if rng.random() < 0.3:
        s = s.title()
    elif rng.random() < 0.2:
        s = s.lower()
    return s


@dataclass
class Corpus:
    documents: pd.DataFrame
    truth: pd.DataFrame
    addresses: pd.DataFrame
    labeled_pairs: pd.DataFrame
    entities: list[dict] = field(default_factory=list)


def generate_corpus(n_entities: int = 200, seed: int = 42,
                    media_ratio: float = 0.5) -> Corpus:
    rng = random.Random(seed)
    words = _distinct_words(rng, n_entities * 2 + 50)
    widx = 0

    entities: list[dict] = []
    n_company = int(n_entities * 0.75)
    used_surnames = 0

    for eid in range(n_entities):
        if eid < n_company:
            # company entity: 1-2 distinctive tokens + industry/suffix noise
            k = 1 if rng.random() < 0.55 else 2
            core = [words[widx + j] for j in range(k)]
            widx += k
            base = " ".join(core)
            aliases = {base + " " + rng.choice(_INDUSTRY) + " " + rng.choice(_SUFFIXES)}
            n_alias = rng.randint(2, 5)
            while len(aliases) < n_alias:
                r = rng.random()
                if r < 0.30:  # suffix / industry-word variation (shared-word channel)
                    a = base + " " + rng.choice(_INDUSTRY)
                    if rng.random() < 0.6:
                        a += " " + rng.choice(_SUFFIXES)
                elif r < 0.50:  # bare core
                    a = base
                elif r < 0.68:  # region word (standalone-word rule / cosine channel)
                    a = base + " " + rng.choice(STANDALONE_WORDS[:16]) + " " + rng.choice(_SUFFIXES)
                elif r < 0.88:  # typo in one core token (Jaro channel)
                    t = core[rng.randrange(len(core))]
                    a = base.replace(t, _typo(rng, t)) + " " + rng.choice(_INDUSTRY)
                else:  # reordered tokens (cosine / shared-word channel)
                    shuffled = core[:] if k == 1 else [core[1], core[0]]
                    a = " ".join(shuffled) + " " + rng.choice(_SUFFIXES)
                aliases.add(a)
            entities.append({"entity_id": eid, "kind": "company",
                             "aliases": sorted(aliases)})
        else:
            # human entity: first/last with initials & nickname variants.
            # Surnames are unique per entity: common-word first names clean to
            # the bare surname in company mode, so two entities sharing a
            # surname would collide at jw_distance=0 — a false positive even
            # the reference could only catch via human review.
            first = rng.choice(FIRST_NAMES)
            if used_surnames < len(SURNAMES):
                last = sorted(set(SURNAMES))[used_surnames]
                used_surnames += 1
            else:
                last = words[widx]
                widx += 1
            nicks = [n for s, n in NICKNAMES if s == first]
            variants = {f"{first} {last}", f"{last}, {first}"}
            if rng.random() < 0.5:
                variants.add(f"{first[0]} {last}")
            if rng.random() < 0.4:
                mid = rng.choice("ABCDEFGHJKLMNPRSTW")
                variants.add(f"{first} {mid} {last}")
                variants.add(f"{first[0]} {mid} {last}")
            if nicks and rng.random() < 0.5:
                variants.add(f"{rng.choice(nicks)} {last}")
            entities.append({"entity_id": eid, "kind": "human",
                             "aliases": sorted(variants)})

    # ---- truth table + jittered surface forms -------------------------------
    truth_rows = []
    surface_forms: list[tuple[str, int]] = []
    surface_of: dict[tuple[int, str], str] = {}
    seen_names: set[str] = set()
    for e in entities:
        for a in e["aliases"]:
            s = _punct_jitter(rng, a)
            if s in seen_names:  # surface-form collisions would break truth
                s = a
            if s in seen_names:
                continue
            seen_names.add(s)
            truth_rows.append({"name": s, "entity_id": e["entity_id"]})
            surface_forms.append((s, e["entity_id"]))
            surface_of[(e["entity_id"], a)] = s
    truth = pd.DataFrame(truth_rows)

    # ---- documents: interleaved text + media spans --------------------------
    doc_rows = []
    form_queue = surface_forms[:]
    rng.shuffle(form_queue)
    doc_id = 0
    qi = 0
    while qi < len(form_queue):
        n_text = rng.randint(1, 3)
        picks = form_queue[qi : qi + n_text]
        qi += n_text
        spans = []
        offset = 0
        for name, _eid in picks:
            if rng.random() < media_ratio:
                spans.append({"kind": "media", "text": None,
                              "media_ref": f"media://blob/{rng.getrandbits(48):012x}",
                              "offset": offset})
                offset += rng.randint(1, 9)
            spans.append({"kind": "text", "text": name, "media_ref": None,
                          "offset": offset})
            offset += rng.randint(1, 9)
        if rng.random() < media_ratio / 2:
            spans.append({"kind": "media", "text": None,
                          "media_ref": f"media://blob/{rng.getrandbits(48):012x}",
                          "offset": offset})
        doc_rows.append({"doc_id": f"doc-{doc_id:07d}", "spans": spans})
        doc_id += 1
    documents = pd.DataFrame(doc_rows)

    # ---- addresses (entity-private; PO-box variants) -------------------------
    addr_rows = []
    for e in entities:
        if rng.random() < 0.7:
            if rng.random() < 0.4:
                po = rng.choice(["PO BOX", "P.O. BOX", "P O BOX", "DRAWER", "POB"])
                addr = f"{po} {rng.randint(10, 9999)}, {rng.choice(_CITIES)} {rng.randint(70000, 79999)}"
            else:
                addr = (f"{rng.randint(100, 9999)} {rng.choice(_STREETS)}, "
                        f"{rng.choice(_CITIES)} {rng.randint(70000, 79999)}")
            share = [a for a in e["aliases"] if rng.random() < 0.6]
            if len(share) < 2 and len(e["aliases"]) >= 2:
                share = e["aliases"][:2]
            for a in share:
                s = surface_of.get((e["entity_id"], a))
                if s is not None:
                    addr_rows.append({"name": s, "address": addr})
    # single-name addresses (must be dropped by the matcher)
    for i in range(max(3, n_entities // 20)):
        addr_rows.append({"name": truth.iloc[rng.randrange(len(truth))]["name"],
                          "address": f"{rng.randint(1, 99)} LONELY LN, {rng.choice(_CITIES)} {rng.randint(70000, 79999)}-{i}"})
    addresses = pd.DataFrame(addr_rows).drop_duplicates()

    # ---- labeled pairs: positives from truth, hard negatives ----------------
    by_entity: dict[int, list[str]] = {}
    for s, eid in surface_forms:
        by_entity.setdefault(eid, []).append(s)
    pos = []
    for eid, names in by_entity.items():
        for a, b in itertools.combinations(sorted(names), 2):
            pos.append({"name": min(a, b), "match": max(a, b), "keep": 1})
    neg = []
    eids = sorted(by_entity)
    for _ in range(len(pos)):
        e1, e2 = rng.sample(eids, 2)
        a = rng.choice(by_entity[e1])
        b = rng.choice(by_entity[e2])
        neg.append({"name": min(a, b), "match": max(a, b), "keep": 0})
    # hard negatives: cross-entity pairs sharing a token (e.g. two humans
    # with the same first name). The reference's 1,000-pair labeled sample
    # was drawn from *actual candidate pairs* (writeups §"random forest"),
    # so its negatives are exactly these hard cases — without them the RF
    # never learns that a shared first name is not a match.
    # pair the *surfaces that share the token* so the labeled pair is an
    # actual candidate pair (training joins labels against the candidate
    # table — a label for a non-candidate pair is silently dropped).
    # ALL shared tokens qualify, including 1-2 char initials: same-initials
    # cross-entity human names ('A J X' vs 'A J Y') are the candidate-pair
    # family that explodes quadratically at scale, and excluding them from
    # the labeled negatives leaves the RF blind to it (found at sf1, where
    # it collapsed pairwise precision; the reference's sample was drawn
    # from actual candidate pairs, which include these).
    tok_surfaces: dict[str, dict[int, str]] = {}
    for s, eid in surface_forms:
        for tok in s.upper().replace(",", " ").replace(".", " ").split():
            tok_surfaces.setdefault(tok, {}).setdefault(eid, s)
    hard = []
    for tok in sorted(tok_surfaces):
        per_entity = tok_surfaces[tok]
        if not 2 <= len(per_entity) <= 8:
            continue
        for e1, e2 in itertools.combinations(sorted(per_entity), 2):
            a, b = per_entity[e1], per_entity[e2]
            hard.append({"name": min(a, b), "match": max(a, b), "keep": 0})
    rng.shuffle(hard)
    neg.extend(hard[: len(pos)])
    labeled = (
        pd.DataFrame(pos + neg)
        .drop_duplicates(subset=["name", "match"])
        .sort_values(["name", "match"])
        .reset_index(drop=True)
    )

    return Corpus(documents=documents, truth=truth, addresses=addresses,
                  labeled_pairs=labeled, entities=entities)


# scale-factor → entity count (roughly matching driver testdata row budgets)
SF_ENTITIES = {"sf0.001": 60, "sf0.01": 250, "sf0.1": 1500, "sf1": 12000}

def _fixture_root() -> str:
    if "SPARK_GRAFT_FIXTURES" in os.environ:
        return os.environ["SPARK_GRAFT_FIXTURES"]
    if "__file__" in globals():
        pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        # under spark-submit --py-files the package lives inside a zip —
        # not a writable directory; fall back to a tmp root there
        if os.path.isdir(pkg_parent):
            return os.path.join(pkg_parent, "data", "fixtures")
    import tempfile

    return os.path.join(tempfile.gettempdir(), "nm_spark_fixtures")


FIXTURE_ROOT = _fixture_root()


def fixture_dir(sf: str) -> str:
    return os.path.join(FIXTURE_ROOT, sf)


def sf_from_path(sf_dir: str) -> str:
    """Map a driver testdata dir (/root/testdata/sf0.01) to our fixture sf."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in SF_ENTITIES else "sf0.01"


FIXTURE_VERSION = 5  # bump to force regeneration after datagen changes


def ensure_fixtures(sf: str = "sf0.01", seed: int = 42) -> str:
    """Write fixture parquet for ``sf`` if missing; returns the directory.

    Deterministic: re-generation produces identical content, so both Spark
    queries and DuckDB oracle SQL can read the same files.
    """
    out = fixture_dir(sf)
    marker = os.path.join(out, "_COMPLETE")
    expected = f"v={FIXTURE_VERSION} seed={seed} n_entities={SF_ENTITIES[sf]}\n"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == expected:
                return out
    os.makedirs(out, exist_ok=True)
    corpus = generate_corpus(n_entities=SF_ENTITIES[sf], seed=seed)
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_type = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]
        )
    )
    doc_tbl = pa.table(
        {
            "doc_id": pa.array(corpus.documents["doc_id"], type=pa.string()),
            "spans": pa.array(corpus.documents["spans"].tolist(), type=span_type),
        }
    )
    pq.write_table(doc_tbl, os.path.join(out, "documents_spans.parquet"))
    pq.write_table(pa.Table.from_pandas(corpus.truth, preserve_index=False),
                   os.path.join(out, "truth_clusters.parquet"))
    pq.write_table(pa.Table.from_pandas(corpus.addresses, preserve_index=False),
                   os.path.join(out, "addresses.parquet"))
    pq.write_table(pa.Table.from_pandas(corpus.labeled_pairs, preserve_index=False),
                   os.path.join(out, "labeled_pairs.parquet"))
    with open(marker, "w") as f:
        f.write(expected)
    return out
