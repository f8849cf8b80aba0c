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
    # retired r14 (slot funds x_events_sessionize_chunked); frozen
    # verbatim from the r11-graded registry oracle
    "a4_stratified_sample": """
    select c_mktsegment, count(*) as n_sampled,
           count(distinct c_custkey) as n_customers
    from customer
    where (cast(('0x' || substr(md5(cast(c_custkey as varchar)), 1, 15)) as bigint) % 1000) <
          case c_mktsegment when 'BUILDING' then 200 else 100 end
    group by c_mktsegment
    """,
    # retired r14 (slot funds x_multimodal_resize_png); frozen verbatim
    # from the r11-graded registry oracle (_DUCK_TEMPERATURE expanded)
    "x_mixture_epoch": r"""
    with toks as (
      select doc_id, source, len(string_split(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g')), ' ')) as n_tokens
      from documents where length(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g'))) > 0
    ), agg as (
      select source,
             cast(count(*) as bigint) as n_docs,
             cast(sum(n_tokens) as bigint) as total_tokens
      from toks group by source
    ), sh as (
      select source, n_docs, total_tokens,
             total_tokens / cast(sum(total_tokens) over () as double) as share
      from agg
    ), sq as (
      select *, cast(round(sqrt(share), 6) as decimal(18,6)) as sqrt_share
      from sh
    ), tw as (
      select source, n_docs, total_tokens,
             round(share, 6) as token_share,
             round(cast(sqrt_share as double)
                   / cast(sum(sqrt_share) over () as double), 6)
               as sample_weight,
             round((round(cast(sqrt_share as double)
                   / cast(sum(sqrt_share) over () as double), 6)) / share, 6)
               as upsample_factor
      from sq
    )
    , assigned as (
      select d.doc_id, d.source,
             w.upsample_factor * 1.0 as f,
             cast(('0x' || substr(
                 md5('mix' || chr(1) || cast(d.doc_id as varchar)), 1, 15))
                  as bigint) % 1000000 as b
      from documents d join tw w using (source)
    ), copies as (
      select doc_id, source,
             cast(floor(f) as bigint)
             + case when b < cast(round((f - floor(f)) * 1000000, 0) as bigint)
                    then 1 else 0 end as n
      from assigned
    )
    select doc_id, source,
           cast(unnest(generate_series(1, n)) as int) as copy_no
    from copies
    where n >= 1
    """,
    # retired r14 (slot funds x_audio_zero_crossings); frozen verbatim
    # from the r11-graded registry oracle (_DUCK_PQ_TOPK — the oracle
    # it shared with the still-registered x_ann_pq_topk)
    "x_ann_pq_index_search": """
    with cb as (
      select s.range as s, e.vec_id as j,
             list_transform(e.embedding[s.range * 16 + 1 : s.range * 16 + 16],
                            x -> cast(x as double)) as c
      from embeddings e cross join range(4) s
      where e.vec_id < 8
    ), sub as (
      select e.vec_id, s.range as s,
             list_transform(e.embedding[s.range * 16 + 1 : s.range * 16 + 16],
                            x -> cast(x as double)) as v
      from embeddings e cross join range(4) s
    ), d2 as (
      select sub.vec_id, sub.s, cb.j,
             round(list_reduce(
               list_prepend(cast(0.0 as double),
                 list_transform(range(1, 17),
                   t -> (sub.v[t] - cb.c[t]) * (sub.v[t] - cb.c[t]))),
               (acc, x) -> acc + x), 6) as dist
      from sub join cb on cb.s = sub.s
    ), picked as (
      select vec_id, s, j, dist,
             row_number() over (
               partition by vec_id, s order by dist, j) as rn
      from d2
    ), codes as (
      select vec_id,
             string_agg(cast(j as varchar), ',' order by s) as pq_codes,
             round(sum(dist), 6) as pq_err
      from picked where rn = 1 group by vec_id
    )
    , split as (
      select vec_id,
             list_transform(string_split(pq_codes, ','),
                            x -> cast(x as int)) as cl
      from codes
    ), q as (
      select e.vec_id as query_id, s.range as s,
             list_transform(e.embedding[s.range * 16 + 1 : s.range * 16 + 16],
                            x -> cast(x as double)) as qv
      from embeddings e cross join range(4) s
      where e.vec_id < 8
    ), lut as (
      select q.query_id, q.s, cb.j,
             list_reduce(
               list_prepend(cast(0.0 as double),
                 list_transform(range(1, 17),
                   t -> (q.qv[t] - cb.c[t]) * (q.qv[t] - cb.c[t]))),
               (acc, x) -> acc + x) as dist
      from q join cb on cb.s = q.s
    ), adc as (
      select l0.query_id, sp.vec_id as neighbor_id,
             round(l0.dist + l1.dist + l2.dist + l3.dist, 6) as adc_dist
      from split sp
      join lut l0 on l0.s = 0 and l0.j = sp.cl[1]
      join lut l1 on l1.s = 1 and l1.j = sp.cl[2]
                 and l1.query_id = l0.query_id
      join lut l2 on l2.s = 2 and l2.j = sp.cl[3]
                 and l2.query_id = l0.query_id
      join lut l3 on l3.s = 3 and l3.j = sp.cl[4]
                 and l3.query_id = l0.query_id
      where sp.vec_id <> l0.query_id
    )
    select query_id, neighbor_id, adc_dist, rank from (
      select *, cast(row_number() over (
        partition by query_id order by adc_dist, neighbor_id) as int) as rank
      from adc)
    where rank <= 10
    """,
    # retired r15 (slots fund x_validate_expectations /
    # x_multimodal_resize_gif / x_text_bigram_logprob); frozen
    # verbatim from the r12-graded registry text (bucketcap's is the
    # generated _duck_minhash_verified(2) expansion)
    "j_semi_nations_with_suppliers": """
    select n_nationkey, n_name from nation n
    where exists (select 1 from supplier s where s.s_nationkey = n.n_nationkey)
    """,
    "x_ann_ivf_assign": """
    with centroids as (
      select vec_id as centroid_id, cast(embedding as double[]) as c
      from embeddings where vec_id < 8
    ), scored as (
      select e.vec_id, c.centroid_id,
             round(list_dot_product(cast(e.embedding as double[]), c.c)
                   / (sqrt(list_dot_product(cast(e.embedding as double[]),
                                            cast(e.embedding as double[])))
                      * sqrt(list_dot_product(c.c, c.c))), 6) as sim
      from embeddings e cross join centroids c
    ), ranked as (
      select *, row_number() over (
        partition by vec_id order by sim desc, centroid_id) as rn
      from scored
    )
    select vec_id, centroid_id, sim from ranked where rn = 1
    """,
    "x_dedup_minhash_bucketcap": r"""
    with toks as (
      select doc_id, string_split(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g')), ' ') as ws from documents
    ), sh as (
      select doc_id,
             unnest(list_distinct([
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
               for i in range(1, greatest(len(ws) - 1, 1))
             ])) as shingle
      from toks where len(ws) >= 3
    ),
    sig as (
      -- hash i = 8-hex window (i % 4) of md5(seed (i // 4) | shingle):
      -- 4 independent 32-bit draws per digest (disjoint windows of a
      -- uniformly-mixed digest), 2 md5s per shingle instead of 8
      select doc_id, i,
             min(cast(('0x' || substr(
                   md5(cast(i // 4 as varchar) || '|' || shingle),
                   1 + 8 * (i % 4), 8)) as bigint)) as mh
      from sh cross join range(8) seeds(i)
      group by doc_id, i
    ), sigarr as (
      select doc_id, list(mh order by i) as s from sig group by doc_id
    ), banded as (
      select doc_id, b,
             md5(cast(b as varchar) || ':' ||
                 cast(s[b * 2 + 1] as varchar) || ',' ||
                 cast(s[b * 2 + 2] as varchar)) as bucket
      from sigarr cross join range(4) bb(b)
    ), okb as (
      select b, bucket from banded group by b, bucket
      having count(*) <= 2
    ), cand as (
      select distinct x.doc_id as a_id, y.doc_id as b_id
      from banded x join okb o on x.b = o.b and x.bucket = o.bucket
      join banded y
        on x.b = y.b and x.bucket = y.bucket and x.doc_id < y.doc_id
    ), sizes as (
      select doc_id, count(*) as n_sh from sh group by doc_id
    ), common as (
      select s1.doc_id as a_id, s2.doc_id as b_id, count(*) as n_common
      from sh s1 join sh s2
        on s1.shingle = s2.shingle and s1.doc_id < s2.doc_id
      group by 1, 2
    ), mh_verified as (
      select c.a_id, c.b_id,
             round(cast(n_common as double)
                   / (sa.n_sh + sb.n_sh - n_common), 6) as jaccard
      from cand c
      join common m on m.a_id = c.a_id and m.b_id = c.b_id
      join sizes sa on sa.doc_id = c.a_id
      join sizes sb on sb.doc_id = c.b_id
      where round(cast(n_common as double)
                  / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.2
    )
    select a_id, b_id, jaccard from mh_verified
    """,
    # retired r16 (slots fund x_url_canonical / x_merge_upsert /
    # x_scd2_apply); frozen verbatim from the r13-graded registry text
    # — the three fake-mode multimodal plumbing rows, whose families
    # stay graded by x_multimodal_decode_real / x_multimodal_resize_real
    # + the codec triple / x_multimodal_audio_real + x_audio_zero_crossings
    "x_multimodal_decode_meta": """
    select doc_id,
           strlen(text) as byte_len,
           md5(text) as content_md5,
           cast(1 + cast(('0x' || substr(md5(text), 1, 4)) as int) % 1024 as int)
             as width,
           cast(1 + cast(('0x' || substr(md5(text), 5, 4)) as int) % 1024 as int)
             as height
    from documents
    """,
    "x_multimodal_resize": """
    select doc_id,
           cast(224 as int) as width,
           cast(224 as int) as height,
           md5(text || '224x224') as resized_md5
    from documents
    """,
    # bytes == codepoints (ASCII testdata, asserted in round-2 probe);
    # exact int64 square-sum then single double divides — bit-identical
    # across engines, no rounding needed
    "x_multimodal_audio": """
    select doc_id,
           strlen(text) as n_samples,
           cast(strlen(text) as double) / cast(16000 as double) as duration_s,
           case when strlen(text) = 0 then cast(0.0 as double)
                else sqrt(
                  cast(list_sum(list_transform(string_split_regex(text, ''),
                                               c -> unicode(c) * unicode(c)))
                       as double)
                  / cast(strlen(text) as double)) end as rms_energy
    from documents
    """,
    # retired r17 (slots fund x_kmv_distinct / x_kmv_grouped /
    # x_countmin_heavy); frozen verbatim from the r14-graded registry
    # text. CUBE and ROLLUP are grouping-sets sugar over the same
    # Expand operator, so the family stays graded by the richer
    # g_grouping_sets.
    "g_cube_order_status": """
    select o_orderstatus, o_orderpriority, count(*) as n_orders
    from orders
    group by cube(o_orderstatus, o_orderpriority)
    """,
    "g_rollup_pricing": """
    select l_returnflag, l_linestatus,
           count(*) as n_items,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty
    from lineitem
    group by rollup(l_returnflag, l_linestatus)
    """,
    # retired r17: the chunk-and-stitch sessionize escalation was
    # graded against the SAME oracle text as the still-registered
    # x_events_sessionize (a literal answer-twin — the physical-plan
    # divergence is what test_properties.py's chunk/single bit-identity
    # pin proves); frozen verbatim from the r14-graded registry
    # (_DUCK_SESSIONIZE prefix expanded), and
    # test_queued_r14.py::test_chunked_shares_the_sessionize_oracle
    # asserts this text still equals the live sessionize oracle
    "x_events_sessionize_chunked": """
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

    select user_id, session_id, count(*) as n_events,
           min(ts) as session_start, max(ts) as session_end
    from numbered group by user_id, session_id
    """,
    # retired r18 (slots fund x_digit_hist / x_digit_quantiles /
    # x_robots_decisions); frozen verbatim from the r15-graded registry
    # text (the _NORM whitespace-normalization macro expanded in the
    # fingerprint/logprob oracles). The families stay graded:
    # exact dedup is the literal first stage of x_dedup_fingerprint /
    # x_dedup_lines; content_md5 is the same md5-family normalization
    # as x_dedup_fingerprint + a3_table_fingerprint; the LM scorer
    # stays graded one order up by x_text_bigram_logprob.
    "x_dedup_exact": """
    select min(doc_id) as doc_id, count(*) as n_dups
    from documents group by text
    """,
    "x_doc_fingerprint": r"select doc_id, md5(trim(regexp_replace("
    r"regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g'))) "
    r"as content_md5 from documents",
    "x_text_unigram_logprob": r"""
    with toks0 as (
      select doc_id, string_split(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g')), ' ') as ws
      from documents where length(trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'), '\s+', ' ', 'g'))) > 0
    ), positions as (
      select doc_id, ws, unnest(range(1, len(ws) + 1)) as pos from toks0
    ), toks as (
      select doc_id, pos, ws[pos] as term from positions
    ), counts as (
      select term, count(*) as c from toks group by term
    ), total as (
      select cast(sum(c) as double) as total from counts
    ), scored as (
      select doc_id, pos,
             log2(cast(c as double) / (select total from total)) as lp
      from toks join counts using (term)
    ), packed as (
      select doc_id, list(lp order by pos) as seq from scored group by doc_id
    )
    select doc_id,
           cast(len(seq) as bigint) as n_tokens,
           round(-list_reduce(list_prepend(0.0, seq), (a, b) -> a + b)
                 / len(seq), 6) as mean_neg_logprob
    from packed
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
    from hive_scripts_spark.plans import (
        analytics_queries,
        extension_queries,
        reference_queries,
    )

    for mod in (reference_queries, extension_queries, analytics_queries):
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
