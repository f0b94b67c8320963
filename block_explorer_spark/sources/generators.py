"""Deterministic GBE-shaped fixture generators.

Replicates the *shapes* of the reference's randomized test data
(testutils/generators.go: lifelines 159-208, jet split trees 399-466;
testutils/models.go pulse chains; migrations/generate.go flat seeds)
with a seeded RNG so tests are reproducible. Everything returns plain
Python row dicts; callers build DataFrames with the pinned schemas.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

PULSE_STEP = 10
GENESIS_PULSE = 65537


def _rng(seed: int) -> random.Random:
    return random.Random(seed)


def _rand_bytes(rng: random.Random, n: int = 32) -> bytes:
    return bytes(rng.getrandbits(8) for _ in range(n))


def make_pulses(
    start: int = 4_000_000,
    count: int = 10,
    gaps: tuple[int, ...] = (),
    complete: bool = True,
    sequential: bool = True,
    base_ts: int = 1_600_000_000,
) -> list[dict]:
    """Pulse chain with step 10; indices in `gaps` are omitted (chain holes).

    Links always point at the *nominal* neighbors (pn±10) as the
    reference's ingest does; repair of missing neighbors is the query
    side's job (W2/J2).
    """
    rows = []
    for i in range(count):
        if i in gaps:
            continue
        pn = start + i * PULSE_STEP
        rows.append(
            {
                "pulse_number": pn,
                "prev_pulse_number": pn - PULSE_STEP,
                "next_pulse_number": pn + PULSE_STEP,
                "is_complete": complete,
                "is_sequential": sequential,
                "timestamp": base_ts + i * PULSE_STEP,
                "jet_drop_amount": 0,
                "record_amount": 0,
            }
        )
    return rows


def make_jet_drop(
    rng: random.Random,
    pulse_number: int,
    jet_id: str,
    record_amount: int = 0,
    first_prev_hash: bytes | None = None,
    second_prev_hash: bytes | None = None,
    timestamp: int = 1_600_000_000,
) -> dict:
    return {
        "pulse_number": pulse_number,
        "jet_id": jet_id,
        "first_prev_hash": first_prev_hash or _rand_bytes(rng),
        "second_prev_hash": second_prev_hash or _rand_bytes(rng),
        "hash": _rand_bytes(rng),
        "raw_data": _rand_bytes(rng),
        "timestamp": timestamp,
        "record_amount": record_amount,
    }


def make_record(
    rng: random.Random,
    pulse_number: int,
    jet_id: str,
    order: int,
    rec_type: str = "state",
    object_reference: bytes | None = None,
    prev_record_reference: bytes | None = None,
    prototype_reference: bytes | None = None,
    timestamp: int = 1_600_000_000,
) -> dict:
    return {
        "reference": _rand_bytes(rng),
        "type": rec_type,
        "object_reference": object_reference or _rand_bytes(rng),
        "prototype_reference": prototype_reference or _rand_bytes(rng),
        "payload": _rand_bytes(rng, 16),
        "prev_record_reference": prev_record_reference,
        "hash": _rand_bytes(rng),
        "raw_data": _rand_bytes(rng),
        "jet_id": jet_id,
        "pulse_number": pulse_number,
        "order": order,
        "timestamp": timestamp,
    }


@dataclass
class Lifeline:
    """One object's records across pulses (testutils/generators.go:159-208)."""

    object_reference: bytes
    records: list[dict] = field(default_factory=list)


def make_lifeline(
    seed: int,
    pulses: list[int],
    records_per_pulse: int = 3,
    jet_id: str = "0",
    deactivate_last: bool = False,
) -> Lifeline:
    """Chained state records for one object over the given pulses.

    Pulse 1: a `request` side record + an `activate` state, then amends;
    later pulses: amend chains continuing across pulse boundaries via
    prev_record_reference.
    """
    rng = _rng(seed)
    obj = _rand_bytes(rng)
    life = Lifeline(object_reference=obj)
    prev_ref: bytes | None = None
    for pi, pn in enumerate(pulses):
        order = 1
        if pi == 0:
            life.records.append(
                make_record(rng, pn, jet_id, order, rec_type="request", object_reference=obj)
            )
            order += 1
        for _ in range(records_per_pulse):
            rec = make_record(
                rng,
                pn,
                jet_id,
                order,
                rec_type="state",
                object_reference=obj,
                prev_record_reference=prev_ref,
            )
            prev_ref = rec["reference"]
            life.records.append(rec)
            order += 1
    if deactivate_last and life.records:
        life.records[-1]["payload"] = b"deactivate"
    return life


def make_jet_split_tree(seed: int, root_jet: str, start_pulse: int, depth: int) -> list[dict]:
    """Jet split tree: root at p, children j0/j1 at p+10, ... to `depth`.

    Child's first_prev_hash = parent's hash (links the prev/next drop
    graph). reference: testutils/generators.go:399-466
    """
    rng = _rng(seed)
    drops: list[dict] = []
    level = [make_jet_drop(rng, start_pulse, root_jet)]
    drops.extend(level)
    for d in range(1, depth + 1):
        pn = start_pulse + d * PULSE_STEP
        nxt = []
        for parent in level:
            for bit in ("0", "1"):
                child = make_jet_drop(
                    rng, pn, parent["jet_id"] + bit, first_prev_hash=parent["hash"]
                )
                nxt.append(child)
        drops.extend(nxt)
        level = nxt
    return drops


def make_flat_seed(
    seed: int, n_pulses: int = 20, n_drops: int = 50, n_records: int = 100
) -> tuple[list[dict], list[dict], list[dict]]:
    """Loadtest-shaped flat seed (migrations/generate.go:112-141)."""
    rng = _rng(seed)
    pulses = make_pulses(count=n_pulses)
    drops = []
    for i in range(n_drops):
        p = rng.choice(pulses)
        jet = format(i % 16, "04b")
        drops.append(make_jet_drop(rng, p["pulse_number"], jet, timestamp=p["timestamp"]))
    drops_dedup: dict[tuple, dict] = {(d["pulse_number"], d["jet_id"]): d for d in drops}
    drops = list(drops_dedup.values())
    records = []
    for i in range(n_records):
        d = rng.choice(drops)
        records.append(
            make_record(
                rng,
                d["pulse_number"],
                d["jet_id"],
                order=i,
                rec_type=rng.choice(["state", "request", "result"]),
                timestamp=d["timestamp"],
            )
        )
    for d in drops:
        d["record_amount"] = sum(
            1
            for r in records
            if r["pulse_number"] == d["pulse_number"] and r["jet_id"] == d["jet_id"]
        )
    return pulses, drops, records


# ------------------------------------------- round 7: natural-text fixture

#: Morphology tables for `natural_text_corpus`: content words are
#: prefix+stem+suffix over syllable-built stems, so the corpus has
#: REAL subword statistics (shared stems, productive affixes) instead
#: of the tokNNNNN fixture's flat vocabulary — BPE training on it
#: sustains thousands of merges, like natural language (Sennrich et
#: al. 2016's observation that merges track morphology).
_ONSETS = ["b", "br", "c", "ch", "cl", "d", "dr", "f", "fl", "g", "gr",
           "h", "j", "k", "l", "m", "n", "p", "pl", "pr", "r", "s",
           "sh", "sl", "sp", "st", "str", "t", "th", "tr", "v", "w"]
_NUCLEI = ["a", "e", "i", "o", "u", "ai", "ea", "ee", "oa", "ou"]
_CODAS = ["", "b", "ck", "d", "g", "l", "m", "n", "nd", "ng", "nt",
          "p", "r", "rd", "rm", "s", "sh", "st", "t", "th"]
_PREFIXES = ["", "", "", "re", "un", "over", "pre", "out", "inter"]
_SUFFIXES = ["", "", "s", "ed", "ing", "er", "ers", "ly", "ment",
             "tion", "able", "ness", "ful", "ish"]
_FUNCTION_WORDS = ("the a of to and in that it is was for on as with "
                   "his they at be this from or had by not but what "
                   "all were when we there can an your which their").split()


def natural_text_corpus(
    spark, n_docs: int = 200, seed: int = 11, words_per_doc: int = 80
):
    """Deterministic natural-shaped English corpus (doc_id, text,
    lang, source): ~45% function words, content words sampled Zipf
    over syllable-morphology forms. Driver-generated (fixture-sized),
    byte-stable for a given (n_docs, seed, words_per_doc)."""
    rng = _rng(seed)
    stems = []
    for o in _ONSETS:
        for nu in _NUCLEI:
            for c in _CODAS:
                stems.append(o + nu + c)
    rng.shuffle(stems)
    stems = stems[:600]
    # Zipf-ish cumulative weights over stem ranks
    weights = [1.0 / (r + 1) for r in range(len(stems))]

    def content_word():
        s = rng.choices(stems, weights=weights)[0]
        return rng.choice(_PREFIXES) + s + rng.choice(_SUFFIXES)

    rows = []
    for doc_id in range(n_docs):
        words = []
        for _ in range(words_per_doc):
            if rng.random() < 0.45:
                words.append(rng.choice(_FUNCTION_WORDS))
            else:
                words.append(content_word())
        rows.append((doc_id, " ".join(words), "en", "synthetic"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
