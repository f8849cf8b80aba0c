"""Value checks for the queries retired from the graded registry in
the r9 and r10 one-in-one-out capacity swaps (COVERAGE.md "Registry
capacity").

Retirement dropped their driver rows, not their semantics: each
function stayed in the plans modules and is compared here against the
EXACT oracle SQL the driver last graded it with (r8 for the r9
retirees, r9 for ``x_curation_pipeline``), using the same
order-insensitive digest as ``tools/parity.py``. This keeps the
"every operator value-checked somewhere" invariant while freeing the
window slots for `x_dedup_semantic` / `x_decontaminate_embedding`
(r9) and `x_dedup_repeated_spans` (r10).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# (function module path, old oracle SQL — verbatim from the r8 registry)
RETIRED = {
    "a4_limit_sample": """
    select o_orderkey, o_orderstatus, o_totalprice
    from orders order by o_orderkey limit 10
    """,
    "p2_project_all": "select * from nation",
    "x_events_hourly_dense": """
    with bounds as (
      select date_trunc('hour', min(ts)) as lo,
             date_trunc('hour', max(ts)) as hi
      from events
    ), hours as (
      select unnest(generate_series(lo, hi, interval 1 hour)) as hour
      from bounds
    ), agg as (
      select date_trunc('hour', ts) as hour,
             cast(count(*) as bigint) as n_events
      from events where event_type = 'purchase' group by 1
    )
    select h.hour, coalesce(a.n_events, 0) as n_events
    from hours h left join agg a on h.hour = a.hour
    """,
    "x_length_histogram": """
    select cast(n_chars - (n_chars % 100) as bigint) as bucket,
           count(*) as n_docs,
           cast(sum(n_chars) as bigint) as sum_chars
    from documents
    group by 1
    """,
    # retired r10 (slot funds x_dedup_repeated_spans); frozen verbatim
    # from the r9 registry's generated _curation_oracle() output
    "x_curation_pipeline": r"""
    with base as (
      -- stage 1: exact dedup on normalized content (min doc_id survives,
      -- and its raw text — arg_min keeps the survivor's own payload)
      select min(doc_id) as doc_id, arg_min(text, doc_id) as text
      from documents
      group by md5(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g')))
    ), toks as (
      select doc_id, text,
             case when length(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g'))) = 0 then cast([] as varchar[])
                  else string_split(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g')), ' ') end as t,
             case when length(trim(lower(text))) = 0 then cast([] as varchar[])
                  else string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') end as lt
      from base
    ), feat as (
      -- stage 2: quality gate (alpha ratio ≥ 0.5 and ≥ 10 tokens)
      select doc_id, t, lt,
             cast(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) as double)
               / greatest(length(text), 1) as alpha_ratio
      from toks
    ), gated as (
      select * from feat where alpha_ratio >= 0.5 and len(t) >= 10
    ), lang as (
      -- stage 3: language-ID
      select doc_id, len(t) as n_tokens,
             len(list_filter(lt, w -> list_contains(['das', 'der', 'die', 'ein', 'ist', 'nicht', 'und'], w))) as hits_de,
             len(list_filter(lt, w -> list_contains(['a', 'and', 'in', 'is', 'of', 'the', 'to'], w))) as hits_en,
             len(list_filter(lt, w -> list_contains(['de', 'el', 'en', 'la', 'los', 'que', 'y'], w))) as hits_es,
             len(list_filter(lt, w -> list_contains(['de', 'des', 'et', 'la', 'le', 'les', 'un'], w))) as hits_fr,
             len(list_filter(lt, w -> list_contains(['了', '和', '在', '我', '是', '有', '的'], w))) as hits_zh
      from gated
    )
    select case when greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) = 0 then 'und' when hits_de = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) then 'de' when hits_en = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) then 'en' when hits_es = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) then 'es' when hits_fr = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) then 'fr' when hits_zh = greatest(hits_de, hits_en, hits_es, hits_fr, hits_zh) then 'zh' end as predicted_lang,
           count(*) as n_docs,
           cast(sum(n_tokens) as bigint) as total_tokens
    from lang
    group by all
    """,
    # retired r13 (slot funds x_multimodal_frames); frozen verbatim
    # from the r12 registry (_DUCK_SESSIONIZE prefix expanded)
    "x_events_session_window": """
    with marked as (
      select user_id, ts, event_id,
             case when lag(ts) over w is null
                       or epoch_us(ts) - epoch_us(lag(ts) over w) > 1800000000
                  then 1 else 0 end as new_session
      from events
      window w as (partition by user_id order by ts, event_id)
    ), numbered as (
      select user_id, ts,
             cast(sum(new_session) over (
               partition by user_id order by ts, event_id
               rows between unbounded preceding and current row)
                  as bigint) as session_id
      from marked
    )
    select user_id,
           min(ts) as session_start,
           max(ts) + interval 30 minute as session_end,
           cast(count(*) as bigint) as n_events
    from numbered group by user_id, session_id
    """,
    # retired r12 (slot funds x_multimodal_resize_jpeg); frozen
    # verbatim from the r11 registry
    "x_ann_ivf_topk_quantized": """
    with corpus0 as (
      select vec_id, cast(embedding as double[]) as v from embeddings
    ), bounds as (
      select vec_id, v, list_min(v) as lo, list_max(v) as hi from corpus0
    ), recon as (
      -- int8-range quantize then dequantize: the corpus the search sees
      select vec_id,
             case when hi = lo then list_transform(v, x -> lo)
                  else list_transform(v, x -> lo +
                    cast(floor((x - lo) * 255.0 / (hi - lo) + 0.5) as int)
                    * ((hi - lo) / 255.0)) end as v
      from bounds
    ), centroids as (
      select vec_id as cid, cast(embedding as double[]) as c
      from embeddings where vec_id < 8
    ), assign as (
      select vec_id as neighbor_id, cell from (
        select r.vec_id, c.cid as cell, row_number() over (
          partition by r.vec_id order by
            round(list_dot_product(r.v, c.c)
                  / (sqrt(list_dot_product(r.v, r.v))
                     * sqrt(list_dot_product(c.c, c.c))), 6) desc, c.cid
        ) as rn
        from recon r cross join centroids c) where rn = 1
    ), probes as (
      -- queries ride FULL-precision (asymmetric distance)
      select vec_id as query_id, cell from (
        select q.vec_id, c.cid as cell, row_number() over (
          partition by q.vec_id order by
            round(list_dot_product(q.v, c.c)
                  / (sqrt(list_dot_product(q.v, q.v))
                     * sqrt(list_dot_product(c.c, c.c))), 6) desc, c.cid
        ) as rn
        from corpus0 q cross join centroids c where q.vec_id < 10)
      where rn <= 2
    ), cand as (
      select p.query_id, a.neighbor_id,
             round(list_dot_product(q.v, r.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(r.v, r.v))), 6) as cosine_sim
      from probes p
      join assign a on a.cell = p.cell and a.neighbor_id <> p.query_id
      join corpus0 q on q.vec_id = p.query_id
      join recon r on r.vec_id = a.neighbor_id
    ), ranked as (
      select query_id, neighbor_id, cosine_sim, row_number() over (
        partition by query_id order by cosine_sim desc, neighbor_id) as rank
      from cand
    )
    select query_id, neighbor_id, cosine_sim, rank from ranked where rank <= 5
    """,
}


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)


def _load_fn(name):
    from hive_scripts_spark.plans import extension_queries, reference_queries

    for mod in (reference_queries, extension_queries):
        if hasattr(mod, name):
            return getattr(mod, name)
    raise AssertionError(f"retired function {name} vanished")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def test_retired_queries_deregistered():
    from hive_scripts_spark.plans.registry import ORACLES, QUERIES

    for name in RETIRED:
        assert name not in QUERIES and name not in ORACLES


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_still_matches_old_oracle(spark, duck, name):
    fn = _load_fn(name)
    got = fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in got.collect()]
    rel = duck.execute(RETIRED[name])
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    assert len(spark_rows) == len(duck_rows)
    assert sorted(c.lower() for c in got.columns) == sorted(
        c.lower() for c in duck_cols
    )
    assert _digest(got.columns, spark_rows) == _digest(duck_cols, duck_rows)
