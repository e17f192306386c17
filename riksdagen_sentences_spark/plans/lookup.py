"""The reference's serving surface (/lookup) as DataFrame query functions.

Reference: FastAPI POST /lookup (/root/reference/models/api/__init__.py:
160-283) dispatches on token shape - a simple token (no space) resolves a
rawtoken by (text, lexical-category QID, iso code) and fetches its linked
sentences; a compound token (contains a space,
models/api/__init__.py:96-99) falls back to a case-insensitive substring
scan over sentences in that language.  Both order by sentence length and
paginate (LIMIT/OFFSET, models/crud/read.py:122-165) and return a total
count (X-Total-Count, models/api/__init__.py:277-280).

Determinism upgrade: ORDER BY length has ties, so sentence_id is the
explicit tiebreak on both the Spark and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import semantics as S
from ..ids import uuid5_col
from . import pipeline as P


def is_compound_token(token: str) -> bool:
    """models/api/__init__.py:96-99."""
    return " " in token


def compound_token_without_syntactic_head(token: str, head: str) -> str:
    """A4 string-subtraction helper (models/api/__init__.py:92-93)."""
    return token.replace(head, "").strip()


# Evolvable-request-field defaults (reference models/api/fields.py:1-
# and models/api/__init__.py:114-157): a missing or value-less field is
# replaced by its default stub IN the echoed body, so clients learn the
# schema by submitting partial documents.  read-only fields are never
# consumed from the request.
DEFAULT_FIELDS: dict[str, dict] = {
    "token": {"type": "text", "name": "token", "read-only": False,
              "value": ""},
    "lexical_category_qid": {
        "type": "text", "name": "lexical_category_qid",
        "read-only": False, "value": "",
    },
    "iso_language_code": {
        "type": "text", "name": "iso_language_code",
        "read-only": False, "value": "",
    },
    "information": {
        "type": "text", "name": "information", "read-only": True,
        "value": (
            "This is an evolvable JSON API. :) Submit data.token ("
            "+ lexical_category_qid + iso_language_code for tokens "
            "without a space). Please remove the errors key from data "
            "before resubmitting."
        ),
    },
}


def normalize_lookup_body(body: dict) -> tuple[dict, dict, list[str]]:
    """Evolvable-body semantics (reference models/api/__init__.py:
    160-240): extract (token, lexical_category_qid, iso_language_code)
    from ``body['data']``, substituting the default field stub for any
    missing/value-less field, and collect the validation error messages
    the API would return alongside the (evolved) data document - data
    and errors deliberately coexist (the reference deviates from JSON
    API 1.1 here to store state in the network).

    Returns (params, evolved_data, errors)."""
    errors: list[str] = []
    data = dict(body.get("data") or {}) if isinstance(body, dict) else {}
    if not data:
        return (
            {"token": "", "lexical_category_qid": "",
             "iso_language_code": ""},
            {k: dict(v) for k, v in DEFAULT_FIELDS.items()},
            ["data object is missing"],
        )
    params: dict = {}
    for key in ("token", "lexical_category_qid", "iso_language_code"):
        field = data.get(key)
        if isinstance(field, dict) and field.get("value"):
            params[key] = field["value"]
        else:
            params[key] = ""
            data[key] = dict(DEFAULT_FIELDS[key])
    data.setdefault("information", dict(DEFAULT_FIELDS["information"]))
    if not params["token"].strip():
        errors.append("Token cannot be empty.")
    elif not is_compound_token(params["token"]):
        # simple tokens need the full key triple (the information
        # field's usage contract)
        if not params["lexical_category_qid"]:
            errors.append(
                "lexical_category_qid cannot be empty for a token "
                "without a space."
            )
        if not params["iso_language_code"]:
            errors.append("iso_language_code cannot be empty.")
    elif not params["iso_language_code"]:
        errors.append("iso_language_code cannot be empty.")
    return params, data, errors


def validate_lookup_params(
    token: str, category_qid: str, iso_code: str
) -> None:
    """A1 request validation against the dims (reference
    models/api/__init__.py:239-251 + models/crud/read.py:320-328);
    raises ValueError like the API's 400 responses."""
    if not token:
        raise ValueError("token must be non-empty")
    if iso_code not in {lang[0] for lang in S.LANGUAGES}:
        raise ValueError(f"unknown iso_language_code: {iso_code}")
    if category_qid not in set(S.LEXICAL_CATEGORIES.values()):
        raise ValueError(f"unknown lexical_category_qid: {category_qid}")


def _postag_for_qid(qid: str) -> list[str]:
    return [t for t, q in S.LEXICAL_CATEGORIES.items() if q == qid]


def _lookup_hits(
    spark: SparkSession,
    docs: DataFrame,
    token: str,
    category_qid: str,
    iso_code: str,
) -> DataFrame:
    base = P.sentence_base(docs)
    sents = P.sentences(base)
    if is_compound_token(token):
        hits = sents.filter(
            (F.col("lang") == iso_code)
            & F.lower(F.col("text")).contains(token.lower())
        )
    else:
        toks = P.token_base(base)
        postags = _postag_for_qid(category_qid)
        acc = toks.filter(
            F.col("tok_accepted")
            & F.col("sent_accepted")
            & (F.col("raw") == token)
            & F.col("pos").isin(postags)
            & (F.col("lang") == iso_code)
        ).select(
            uuid5_col(
                F.lit("sentence"), "text", "document_id", "lang"
            ).alias("sentence_id")
        ).dropDuplicates(["sentence_id"])
        hits = sents.join(acc, "sentence_id", "left_semi")
    return hits


def lookup_sentences(
    spark: SparkSession,
    docs: DataFrame,
    token: str,
    category_qid: str,
    iso_code: str,
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    """A2/A3 lookup returning (sentence_id, text, lang, n_chars) page."""
    hits = _lookup_hits(spark, docs, token, category_qid, iso_code)
    page = (
        hits.select(
            "sentence_id",
            "text",
            "lang",
            F.length("text").alias("n_chars"),
        )
        .orderBy(F.col("n_chars").asc(), F.col("sentence_id").asc())
        .offset(offset)
        .limit(limit)
    )
    return page


def lookup_count(
    spark: SparkSession,
    docs: DataFrame,
    token: str,
    category_qid: str,
    iso_code: str,
) -> DataFrame:
    """The X-Total-Count half of the count-then-page pattern (Q20)."""
    hits = _lookup_hits(spark, docs, token, category_qid, iso_code)
    return hits.agg(F.count("*").alias("total"))


# ---------------------------------------------------------------------------
# Materialized serving path: the reference API serves from the AT-REST
# store (models/crud/read.py:122-165 pages the sentence table by
# rawtoken link), not by re-deriving sentences from raw documents per
# request.  ``materialize_serving_tables`` writes the lake layout a
# /lookup service needs; ``lookup_from_catalog`` answers from it:
#
# - sentences: partitioned by lang (a compound-token scan in one
#   language prunes every other language's directories) and bucketed +
#   sorted by sentence_id,
# - occursIn edges: bucketed + sorted by obj (= sentence_id) with the
#   SAME bucket count, so the edges->sentences semi-join runs with ZERO
#   shuffle Exchange - the shuffle was paid once at write time,
# - rawtokens: a small secondary-index table probed by (text, postag,
#   lang); its ids reach the edge scan as a broadcast semi-join.
# ---------------------------------------------------------------------------

SERVE_SENTENCES = "serve_sentences"
SERVE_OCCURSIN = "serve_occursin"
SERVE_RAWTOKENS = "serve_rawtokens"


def materialize_serving_tables(
    spark: SparkSession,
    docs: DataFrame,
    catalog,
    n_buckets: int = 8,
    prefix: str = "",
) -> None:
    """Build the at-rest serving layout from the pipeline (run once per
    corpus version; every later /lookup reads only these tables).

    The three table builds are independent jobs over the one persisted
    sentence base: the base is materialized eagerly FIRST (persist does
    not de-duplicate in-flight computation, so concurrent writes racing
    a cold cache would each run the kernel chain), then the writes run
    from a small thread pool so one write's task tail back-fills with
    the next write's tasks (guide-standard overlap of independent
    jobs)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F2

    from ..ids import uuid5_col

    base = P.sentence_base(docs).persist()
    base.count()
    sents = P.sentences(base).select(
        "sentence_id", "document_id", "text", "cleaned", "lang",
        "score", "word_count", "sent_idx",
    )
    # projected token cut-point, as in pipeline.triples(): the edge ids
    # are materialized once and the sentence text (needed only inside
    # the sentence id) never enters the cache; the rawtokens and
    # occursIn builds below both consume it concurrently
    toks = P.token_base(base).select(
        "document_id", "sent_idx", "lang", "score", "word_count",
        "tok_idx", "raw", "cleaned_tok", "norm", "pos",
        "tok_accepted", "sent_accepted",
        uuid5_col(
            F2.lit("sentence"), "text", "document_id", "lang"
        ).alias("__sid"),
        uuid5_col(F2.lit("rawtoken"), "raw", "pos", "lang").alias(
            "__rid"
        ),
    ).persist()
    toks.count()
    jobs = (
        (
            prefix + SERVE_SENTENCES,
            sents,
            dict(
                bucket_by=["sentence_id"], n_buckets=n_buckets,
                sort_by=["sentence_id"], partition_by=["lang"],
            ),
        ),
        (
            prefix + SERVE_RAWTOKENS,
            P.rawtokens(toks),
            dict(bucket_by=["rawtoken_id"], n_buckets=n_buckets),
        ),
        (
            prefix + SERVE_OCCURSIN,
            P.occurs_in_edges(toks).select("subj", "obj"),
            dict(bucket_by=["obj"], n_buckets=n_buckets, sort_by=["obj"]),
        ),
    )

    def _write(job) -> None:
        name, df, kw = job
        spark.sparkContext.setJobDescription(f"serve write {name}")
        catalog.write_bucketed(name, df, **kw)

    with ThreadPoolExecutor(max_workers=3) as pool:
        list(pool.map(_write, jobs))
    toks.unpersist()
    base.unpersist()


def lookup_from_catalog(
    spark: SparkSession,
    catalog,
    token: str,
    category_qid: str,
    iso_code: str,
    limit: int = 100,
    offset: int = 0,
    prefix: str = "",
) -> DataFrame:
    """A2/A3 lookup served from the materialized tables - same output
    contract as :func:`lookup_sentences` (pinned equal in tests), but
    the plan touches only the at-rest store: a partition-pruned
    sentences scan for compound tokens; rawtoken-index probe ->
    broadcast semi-join into the bucketed edges -> zero-Exchange
    semi-join into the bucketed sentences for simple tokens."""
    sents = catalog.read_table(prefix + SERVE_SENTENCES)
    if is_compound_token(token):
        hits = sents.filter(
            (F.col("lang") == iso_code)
            & F.lower(F.col("text")).contains(token.lower())
        )
    else:
        postags = _postag_for_qid(category_qid)
        ids = (
            catalog.read_table(prefix + SERVE_RAWTOKENS)
            .filter(
                (F.col("text") == token)
                & F.col("postag").isin(postags)
                & (F.col("lang") == iso_code)
            )
            .select(F.col("rawtoken_id").alias("subj"))
        )
        sent_ids = (
            catalog.read_table(prefix + SERVE_OCCURSIN)
            .join(F.broadcast(ids), "subj", "left_semi")
            .select(F.col("obj").alias("sentence_id"))
        )
        hits = sents.join(sent_ids, "sentence_id", "left_semi")
    return (
        hits.select(
            "sentence_id", "text", "lang",
            F.length("text").alias("n_chars"),
        )
        .orderBy(F.col("n_chars").asc(), F.col("sentence_id").asc())
        .offset(offset)
        .limit(limit)
    )
