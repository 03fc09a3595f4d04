"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline; ``queries()`` exposes one
named pipeline per implemented operator family (SURVEY.md §2 + the
training-data ops); ``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query (same column names, same rounding).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any

from my_ocr_ray.pipelines import queries as Q

_EN_SW = "'the','and','of','to','in','is','that','for','with','on'"
_DE_SW = "'der','die','das','und','ist','von','mit','den','auf','ein'"
_FR_SW = "'le','la','les','et','de','est','pour','dans','que','une'"
_ES_SW = "'el','la','los','las','de','que','es','en','por','con'"

# shared SQL fragments -------------------------------------------------------

_SPANS_CTE = r"""
WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
spans AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS "offset",
         array_to_string(t[(i-1)*8+1 : i*8], ' ') AS span_text
  FROM toks, unnest(generate_series(1, CAST(ceil(len(t)/8.0) AS INT))) AS u(i)
)
"""

_FP = r"md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))"

# explicit Unicode-whitespace class shared verbatim with the Ray
# normalize_text kernel (textproc.WS_CLASS_RE) — see that constant's note
from my_ocr_ray.functions.textproc import WS_CLASS_RE as _WS  # noqa: E402



def _pii_sql() -> str:
    """Redaction cascade built from the SAME rule tuple the Ray kernel
    applies (analysis.PII_RULES) — one nested count-then-replace layer per
    rule, so both engines see each pattern against identical input."""
    from my_ocr_ray.analysis import PII_RULES

    inner = "SELECT doc_id, text, CAST(0 AS BIGINT) AS n FROM documents"
    for pat, repl in PII_RULES:
        p = pat.replace("'", "''")
        inner = (
            "SELECT doc_id, regexp_replace(text, '" + p + "', '" + repl
            + "', 'g') AS text, n + len(regexp_extract_all(text, '" + p
            + "')) AS n FROM (" + inner + ")"
        )
    return (
        "SELECT doc_id, text, CAST(n AS BIGINT) AS n_redactions FROM ("
        + inner + ")"
    )

# MinHash v2 oracle built from the SAME constants as the vectorized kernel
# (functions/textproc.py): token hash = 60-bit md5 prefix mod P, shingle =
# polynomial fold base B, signature = affine (A[s]*h + C[s]) mod P minima.
from my_ocr_ray.functions.textproc import (  # noqa: E402
    MINHASH_A as _A,
    MINHASH_C as _C,
    MOD_P as _P,
    SHINGLE_B as _B,
)


def _th(expr: str) -> str:
    return f"(CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {_P})"


_SH3 = (
    f"((({_th('toks[i]')} * {_B} + {_th('toks[i+1]')}) % {_P}) * {_B} "
    f"+ {_th('toks[i+2]')}) % {_P}"
)

# n-gram language-ID scoring (analysis.lang_id_batch), shared by the lang_id
# per-doc listing and the lang_confusion declared-vs-detected matrix.
_LANGID_SQL = rf"""
        WITH t AS (SELECT doc_id, text, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        s AS (SELECT doc_id, text,
          len(list_filter(toks, x -> lower(x) IN ({_EN_SW}))) AS en,
          len(list_filter(toks, x -> lower(x) IN ({_DE_SW}))) AS de,
          len(list_filter(toks, x -> lower(x) IN ({_FR_SW}))) AS fr,
          len(list_filter(toks, x -> lower(x) IN ({_ES_SW}))) AS es
        FROM t)
        SELECT doc_id, CASE
          WHEN length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g'))
               > 0.2 * greatest(length(text), 1) THEN 'zh'
          WHEN greatest(en, de, fr, es) = 0 THEN 'und'
          WHEN en >= de AND en >= fr AND en >= es THEN 'en'
          WHEN de >= fr AND de >= es THEN 'de'
          WHEN fr >= es THEN 'fr'
          ELSE 'es' END AS lang_pred
        FROM s
        """

_SIGS_CTE = rf"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(generate_series(1, len(toks)-2),
                                  i -> {_SH3})
              ELSE [CAST(0 AS BIGINT)] END AS shs
  FROM t),
sigs AS (
  SELECT doc_id,
         list_min(list_transform(shs, h -> ({_A[0]}*h + {_C[0]}) % {_P})) AS sig0,
         list_min(list_transform(shs, h -> ({_A[1]}*h + {_C[1]}) % {_P})) AS sig1,
         list_min(list_transform(shs, h -> ({_A[2]}*h + {_C[2]}) % {_P})) AS sig2,
         list_min(list_transform(shs, h -> ({_A[3]}*h + {_C[3]}) % {_P})) AS sig3
  FROM sh)
"""


# Sign-LSH candidate pairs over the embeddings table (12 planes x 2 bands),
# shared by the embedding_dups pair listing and the embedding_clusters
# transitive closure.
_EMB_CAND_CTE = """
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b0 AS (SELECT vec_id, v,
  list_sum(list_transform(generate_series(1, 12),
    i -> CASE WHEN v[i] > 0
              THEN CAST(pow(2, i-1) AS BIGINT) ELSE 0 END)) AS bucket
  FROM e),
b1 AS (SELECT vec_id, v,
  list_sum(list_transform(generate_series(1, 12),
    i -> CASE WHEN v[12+i] > 0
              THEN CAST(pow(2, i-1) AS BIGINT) ELSE 0 END)) AS bucket
  FROM e),
cand AS (
  SELECT DISTINCT va, vb FROM (
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM b0 a JOIN b0 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    UNION ALL
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM b1 a JOIN b1 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id))
"""


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full extraction over the
    deterministic synthetic interleaved corpus (docs + rendered media),
    returning the flattened extracted span rows."""
    return Q.q_flagship_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the driver's correctness gate checks the FIRST 50
    # entries, so the first 50 hold >=1 representative per operator
    # family (extraction, parsers, eval metrics, analysis, windows,
    # relational, dedup, ANN, corpus, sampling/set-ops, sketches); the
    # remaining entries are additional members of already-covered
    # families, self-checked by scripts/oracle_check.py.
    return {
        "flagship_extract": Q.q_flagship_extract,
        "span_explode": Q.q_span_explode,
        "extract_reassemble": Q.q_extract_reassemble,
        "recog_parse": Q.q_recog_parse,
        "det_parse": Q.q_det_parse,
        "det_sink": Q.q_det_sink,
        "ocr_metric": Q.q_ocr_metric,
        "hmean_sweep": Q.q_hmean_sweep,
        "ner_f1": Q.q_ner_f1,
        "kie_rowcol": Q.q_kie_rowcol,
        "quality": Q.q_quality,
        "lang_id": Q.q_lang_id,
        "pii_redact": Q.q_pii_redact,
        "gopher_rules": Q.q_gopher_rules,
        "quality_gate": Q.q_quality_gate,
        "events_window": Q.q_events_window,
        "sessionize": Q.q_sessionize,
        "interval_merge": Q.q_interval_merge,
        "orders_join": Q.q_orders_join,
        "asof_join": Q.q_asof_join,
        "range_join": Q.q_range_join,
        "anti_join": Q.q_anti_join,
        "funnel": Q.q_funnel,
        "len_quantiles": Q.q_len_quantiles,
        "group_topk": Q.q_group_topk,
        "exact_dedup": Q.q_exact_dedup,
        "lsh_pairs": Q.q_lsh_pairs,
        "dedup_clusters": Q.q_dedup_clusters,
        "embedding_dups": Q.q_embedding_dups,
        "passage_dedup": Q.q_passage_dedup,
        "incremental_dedup": Q.q_incremental_dedup,
        "split_leakage": Q.q_split_leakage,
        "ann_topk": Q.q_ann_topk,
        "ann_filtered": Q.q_ann_filtered,
        "embedding_centroids": Q.q_embedding_centroids,
        "ngram_topk": Q.q_ngram_topk,
        "decontaminate": Q.q_decontaminate,
        "tfidf_capped": Q.q_tfidf_capped,
        "bigram_lm_capped": Q.q_bigram_lm_capped,
        "epoch_shuffle": Q.q_epoch_shuffle,
        "seq_pack": Q.q_seq_pack,
        "hash_split": Q.q_hash_split,
        "weighted_sample": Q.q_weighted_sample,
        "hll_users": Q.q_hll_users,  # rows-only: sketch estimate has no SQL twin
        "html_extract": Q.q_html_extract,
        "pdf_layout": Q.q_pdf_layout,
        "audio_features": Q.q_audio_features,  # full oracle (integer-exact WAV model)
        "decode_variants": Q.q_decode_variants,  # full oracle (decoders exact on the glyph font)
        "url_canonical": Q.q_url_canonical,
        "video_frames": Q.q_video_frames,  # full oracle (generator gradient restated in SQL)
        # --- past the driver's 50-entry window (same families) ---
        "extract_strip": Q.q_extract_strip,          # extract-family twin
        "sessionize_salted": Q.q_sessionize_salted,  # sessionize twin (skew path)
        "url_filter": Q.q_url_filter,
        "mix_strata": Q.q_mix_strata,
        "winnow_pairs": Q.q_winnow_pairs,
        "drop_dup_passages": Q.q_drop_dup_passages,
        "token_budget": Q.q_token_budget,
        "url_host_stats": Q.q_url_host_stats,  # url family keeps 2 in-window rows
        "interval_merge_salted": Q.q_interval_merge_salted,
        "ocr_eval": Q.q_ocr_eval,
        "rotate_tta": Q.q_rotate_tta,  # rows-only: OCR TTA has no SQL twin
        "hmean_iou": Q.q_hmean_iou,
        "hmean_ic13": Q.q_hmean_ic13,
        "token_count": Q.q_token_count,
        "fingerprint": Q.q_fingerprint,
        "events_parse": Q.q_events_parse,
        "top_docs": Q.q_top_docs,
        "lineitem_agg": Q.q_lineitem_agg,
        "minhash_sig": Q.q_minhash_sig,
        "simhash": Q.q_simhash,
        "jaccard_adjacent": Q.q_jaccard_adjacent,
        "containment": Q.q_containment,
        "pagerank": Q.q_pagerank,
        "ann_ivf": Q.q_ann_ivf,
        "knn_graph": Q.q_knn_graph,
        "knn_graph_ivf": Q.q_knn_graph_ivf,  # rows-only: approximate by construction
        "knn_graph_auto": Q.q_knn_graph_auto,  # data-routed exact/IVF default
        "curate": Q.q_curate,
        "repetition": Q.q_repetition,
        "tfidf": Q.q_tfidf,
        "hash_sample": Q.q_hash_sample,
        "sliding_window": Q.q_sliding_window,
        "shared_grams": Q.q_shared_grams,
        "bpe_tokens": Q.q_bpe_tokens,
        "image_dups": Q.q_image_dups,  # rows-only: image decode has no SQL
        "distinct_users": Q.q_distinct_users,
        "rollup": Q.q_rollup,
        "cms_ngrams": Q.q_cms_ngrams,  # rows-only: approximate; exact twin is ngram_topk
        "semi_join": Q.q_semi_join,
        "stratified_sample": Q.q_stratified_sample,
        "inverted_index": Q.q_inverted_index,
        "quantile_sketch": Q.q_quantile_sketch,  # rows-only: sketch estimate
        "bigram_lm": Q.q_bigram_lm,
        "pmi_bigrams": Q.q_pmi_bigrams,
        "source_divergence": Q.q_source_divergence,
        "oov_rate": Q.q_oov_rate,
        "lang_confusion": Q.q_lang_confusion,
        "readability": Q.q_readability,
        "simhash_dups": Q.q_simhash_dups,
        "length_outliers": Q.q_length_outliers,
        "source_overlap": Q.q_source_overlap,
        "embedding_clusters": Q.q_embedding_clusters,
        "chunk_windows": Q.q_chunk_windows,
        "filter_funnel": Q.q_filter_funnel,
        "dedup_rate": Q.q_dedup_rate,
        "diff_snapshots": Q.q_diff_snapshots,
        "drop_frequent_lines": Q.q_drop_frequent_lines,
        "dup_span_stats": Q.q_dup_span_stats,
        "user_lag": Q.q_user_lag,
        "dsir": Q.q_dsir,
        "embedding_cov": Q.q_embedding_cov,
        "pca_project": Q.q_pca_project,  # rows-only: no SQL eigensolver
        "zscore_source": Q.q_zscore_source,
        "dedup_keep_best": Q.q_dedup_keep_best,
        "normalize_text": Q.q_normalize_text,
        "user_retention": Q.q_user_retention,
        "user_event_seq": Q.q_user_event_seq,
        "fuzzy_decontaminate": Q.q_fuzzy_decontaminate,
        "pq_topk": Q.q_pq_topk,  # rows-only: approximate PQ scores
        "q3_shipping": Q.q_q3_shipping,
        "active_users": Q.q_active_users,
        "ivf_pq": Q.q_ivf_pq,  # rows-only: approximate IVF-PQ scores
        "semdedup": Q.q_semdedup,  # rows-only: LSH candidates, no SQL twin
        "semdedup_prune": Q.q_semdedup_prune,  # rows-only: same candidates
        "neardup_edit": Q.q_neardup_edit,
        "compress_ratio": Q.q_compress_ratio,  # rows-only: no SQL zlib
        "media_thumbs": Q.q_media_thumbs,  # rows-only: no SQL image codec
        "validate": Q.q_validate,
    }


def oracle_sql() -> dict[str, str]:
    out = {
        "span_explode": _SPANS_CTE + 'SELECT doc_id, "offset", span_text FROM spans',
        "extract_reassemble": _SPANS_CTE
        + """
        SELECT doc_id, count(*) AS n_spans,
               string_agg(span_text, ' ' ORDER BY "offset") AS text
        FROM spans GROUP BY doc_id
        """,
        "extract_strip": _SPANS_CTE
        + r"""
        SELECT doc_id, count(*) AS n_spans,
               string_agg(span_text, ' ' ORDER BY "offset") AS text
        FROM spans
        WHERE len(regexp_extract_all(span_text, '\S+')) >= 3
        GROUP BY doc_id
        """,
        "recog_parse": """
        SELECT 'img_' || CAST(doc_id AS VARCHAR) || '.jpg' AS filename,
               CASE WHEN doc_id % 2 = 0 THEN text ELSE 'L' || text END AS text,
               CASE WHEN doc_id % 2 = 0 THEN CAST(8 AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END AS n_box,
               CASE WHEN doc_id % 2 = 0
                    THEN round(CAST(8 * (doc_id % 50) + 28 AS DOUBLE), 2)
                    ELSE 0.0 END AS box_sum
        FROM documents
        """,
        "det_parse": """
        SELECT 'img_' || CAST(doc_id AS VARCHAR) || '.jpg' AS file_name,
               CAST(100 + doc_id % 7 AS BIGINT) AS height,
               CAST(200 + doc_id % 11 AS BIGINT) AS width,
               CAST(1 AS BIGINT) AS n_anns,
               round(CAST(doc_id % 13 + doc_id % 17 + 30 AS DOUBLE), 2) AS bbox_sum,
               CAST(doc_id % 2 AS BIGINT) AS crowd
        FROM documents
        """,
        "det_sink": """
        WITH b AS (SELECT doc_id, doc_id % 20 AS a,
                          (doc_id % 10) / 10.0 AS s FROM documents)
        SELECT 'img_' || CAST(doc_id AS VARCHAR) AS doc_id,
               CAST(a AS VARCHAR) || ',' || CAST(a+1 AS VARCHAR) || ',' ||
               CAST(a+2 AS VARCHAR) || ',' || CAST(a+3 AS VARCHAR) || ',' ||
               CAST(a+4 AS VARCHAR) || ',' || CAST(a+5 AS VARCHAR) || ',' ||
               CAST(a+6 AS VARCHAR) || ',' || CAST(a+7 AS VARCHAR) AS line
        FROM b WHERE s >= 0.5
        UNION ALL
        SELECT 'img_' || CAST(doc_id AS VARCHAR) AS doc_id,
               '50,51,52,53,54,55,56,57' AS line
        FROM documents
        """,
        "ocr_metric": r"""
        WITH p AS (
          SELECT doc_id, substr(text, 1, 40) AS gt,
                 CASE doc_id % 4
                   WHEN 0 THEN substr(text, 1, 40)
                   WHEN 1 THEN upper(substr(text, 1, 40))
                   WHEN 2 THEN substr(substr(text, 1, 40), 2)
                   ELSE reverse(substr(text, 1, 40)) END AS pred
          FROM documents),
        n AS (
          SELECT CASE WHEN pred = gt THEN 1 ELSE 0 END AS m,
                 CASE WHEN lower(pred) = lower(gt) THEN 1 ELSE 0 END AS mic,
                 regexp_replace(lower(gt), '[^a-z0-9一-鿿]', '', 'g') AS gti,
                 regexp_replace(lower(pred), '[^a-z0-9一-鿿]', '', 'g') AS pri
          FROM p),
        e AS (
          SELECT m, mic,
                 CASE WHEN pri = gti THEN 1 ELSE 0 END AS mics,
                 CASE WHEN length(gti) = 0 AND length(pri) = 0 THEN 0.0
                      ELSE CAST(levenshtein(pri, gti) AS DOUBLE)
                           / greatest(length(gti), length(pri), 1) END AS ned
          FROM n)
        SELECT round(CAST(sum(m) AS DOUBLE) / count(*), 4) AS word_acc,
               round(CAST(sum(mic) AS DOUBLE) / count(*), 4) AS word_acc_ignore_case,
               round(CAST(sum(mics) AS DOUBLE) / count(*), 4)
                 AS word_acc_ignore_case_symbol,
               round(1.0 - sum(ned) / count(*), 4) AS one_minus_ned
        FROM e
        """,
        "hmean_iou": """
        WITH m AS (SELECT CASE WHEN doc_id % 8 <= 3 THEN 2 ELSE 1 END AS mt
                   FROM documents)
        SELECT round(CAST(sum(mt) AS DOUBLE) / (2*count(*)), 4) AS recall,
               round(CAST(sum(mt) AS DOUBLE) / (2*count(*)), 4) AS precision,
               round(CAST(sum(mt) AS DOUBLE) / (2*count(*)), 4) AS hmean
        FROM m
        """,
        "hmean_ic13": """
        WITH m AS (
          SELECT CASE WHEN doc_id % 2 = 0 THEN
                   1.0 + CASE WHEN doc_id % 8 <= 1 THEN 1.0
                              WHEN doc_id % 8 = 2 THEN 0.8 ELSE 0.0 END
                 ELSE
                   1.0 + CASE WHEN doc_id % 4 <= 2 THEN 0.8 ELSE 0.0 END
                 END AS hr,
                 CASE WHEN doc_id % 2 = 0 THEN
                   1.0 + CASE WHEN doc_id % 8 <= 1 THEN 1.0
                              WHEN doc_id % 8 = 2 THEN 0.8 ELSE 0.0 END
                 ELSE
                   1.0 + CASE WHEN doc_id % 4 <= 2 THEN 1.6 ELSE 0.0 END
                 END AS hp,
                 2 AS gt_care,
                 CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 3 END AS pred_care
          FROM documents),
        t AS (SELECT sum(hr) / sum(gt_care) AS r,
                     sum(hp) / sum(pred_care) AS p
              FROM m)
        SELECT round(r, 4) AS recall, round(p, 4) AS precision,
               round(CASE WHEN r + p = 0 THEN 0.0
                          ELSE 2.0 * p * r / (r + p) END, 4) AS hmean
        FROM t
        """,
        "hmean_sweep": """
        WITH thrs(thr) AS (SELECT CAST(unnest([0.3,0.4,0.5,0.6,0.7,0.8,0.9])
                                       AS DOUBLE)),
        m AS (
          SELECT thr,
            sum(CASE WHEN (doc_id % 10)/10.0 >= thr AND doc_id % 8 <= 3
                     THEN 2 ELSE 1 END) AS mt,
            sum(CASE WHEN (doc_id % 10)/10.0 >= thr THEN 2 ELSE 1 END) AS pd,
            2 * count(*) AS gt
          FROM documents CROSS JOIN thrs GROUP BY thr),
        h AS (SELECT thr, CAST(mt AS DOUBLE)/gt AS r,
                     CAST(mt AS DOUBLE)/pd AS p FROM m),
        s AS (SELECT thr AS score_thr, round(r, 4) AS recall,
                     round(p, 4) AS precision,
                     round(CASE WHEN r + p = 0 THEN 0.0
                                ELSE 2.0*p*r/(r+p) END, 4) AS hmean
              FROM h)
        SELECT score_thr, recall, precision, hmean
        FROM s ORDER BY hmean DESC, score_thr ASC LIMIT 1
        """,
        "token_count": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
        FROM documents
        """,
        "quality": rf"""
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
          round(CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS mean_token_len,
          round(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                / greatest(length(text), 1), 6) AS alpha_ratio,
          round(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                / greatest(length(text), 1), 6) AS digit_ratio,
          round(CAST(len(list_filter(regexp_extract_all(text, '\S+'),
                                     x -> lower(x) IN ({_EN_SW}))) AS DOUBLE)
                / greatest(len(regexp_extract_all(text, '\S+')), 1), 6) AS stopword_ratio
        FROM documents
        """,
        "lang_id": _LANGID_SQL,
        "lang_confusion": f"""
        WITH p AS ({_LANGID_SQL})
        SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM documents d JOIN p USING (doc_id)
        GROUP BY d.lang, p.lang_pred
        """,
        "fingerprint": f"SELECT doc_id, {_FP} AS fp FROM documents",
        "pii_redact": _pii_sql(),
        "events_parse": r"""
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type
        """,
        "events_window": """
        SELECT CAST((epoch_us(ts)//1000000//3600)*3600 AS BIGINT) AS window_start,
               event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
        """,
        "sessionize": """
        WITH e AS (SELECT user_id, epoch_us(ts)//1000000 AS s, value FROM events),
        marked AS (
          SELECT user_id, s, value,
            CASE WHEN lag(s) OVER (PARTITION BY user_id ORDER BY s) IS NULL
                   OR s - lag(s) OVER (PARTITION BY user_id ORDER BY s) > 1800
                 THEN 1 ELSE 0 END AS brk
          FROM e),
        sess AS (
          SELECT user_id, s, value,
            sum(brk) OVER (PARTITION BY user_id ORDER BY s
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
          FROM marked)
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               min(s) AS session_start,
               max(s) AS session_end, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM sess GROUP BY user_id, session_idx
        """,
        "top_docs": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 10
        """,
        "lineitem_agg": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "orders_join": """
        SELECT n.n_name, count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
        "exact_dedup": f"""
        SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        FROM documents GROUP BY {_FP}
        """,
        "validate": """
        WITH m AS (
          SELECT 'n_chars_matches_text' AS rule,
                 CAST(sum(CASE WHEN length(text) <> n_chars
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
                 CAST(count(*) AS BIGINT) AS n_rows
          FROM documents
          UNION ALL
          SELECT 'lang_known',
                 CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es')
                          THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(count(*) AS BIGINT)
          FROM documents
          UNION ALL
          SELECT 'text_nonempty',
                 CAST(sum(CASE WHEN length(text) = 0
                          THEN 1 ELSE 0 END) AS BIGINT),
                 CAST(count(*) AS BIGINT)
          FROM documents)
        SELECT * FROM m
        """,
        "diff_snapshots": f"""
        WITH old AS (SELECT doc_id, {_FP} AS fp FROM documents
                     WHERE doc_id % 10 < 5),
        base AS (SELECT doc_id,
                        text || ' ' || CASE WHEN doc_id % 20 = 3
                                            THEN 'EDIT' ELSE '' END AS text
                 FROM documents WHERE doc_id % 10 >= 2),
        nw AS (SELECT doc_id, {_FP} AS fp FROM base)
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    ELSE 'changed' END AS status
        FROM old o FULL JOIN nw n ON o.doc_id = n.doc_id
        WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.fp <> n.fp
        """,
        "token_budget": r"""
        WITH s AS (SELECT doc_id, source,
                          CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                            AS n_tokens,
                          md5(CAST(doc_id AS VARCHAR)) AS r
                   FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY source
                                         ORDER BY r, doc_id) AS cum
              FROM s)
        SELECT doc_id, source, n_tokens FROM c WHERE cum <= 400
        """,
        "drop_dup_passages": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        p AS (SELECT doc_id, CAST(i AS BIGINT) AS ci,
                     array_to_string(toks[i*20+1 : i*20+20], ' ') AS ptext
              FROM t, UNNEST(generate_series(0,
                       CAST(ceil(len(toks) / 20.0) AS BIGINT) - 1)) AS u(i)
              WHERE len(toks) > 0),
        h AS (SELECT doc_id, ci, ptext, md5(ptext) AS h FROM p),
        own AS (SELECT h, min(doc_id * 1000000 + ci) AS okey FROM h GROUP BY h),
        k AS (SELECT h.doc_id, h.ci, h.ptext,
                     (h.doc_id * 1000000 + h.ci) = own.okey AS keep
              FROM h JOIN own USING (h))
        SELECT doc_id,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
               coalesce(string_agg(CASE WHEN keep THEN ptext END, ' '
                                   ORDER BY ci), '') AS text
        FROM k GROUP BY doc_id
        """,
        "drop_frequent_lines": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        p AS (SELECT doc_id, CAST(i AS BIGINT) AS ci,
                     array_to_string(toks[i*5+1 : i*5+5], ' ') AS ptext
              FROM t, UNNEST(generate_series(0,
                       CAST(ceil(len(toks) / 5.0) AS BIGINT) - 1)) AS u(i)
              WHERE len(toks) > 0),
        f AS (SELECT ptext, count(*) AS n FROM p GROUP BY ptext),
        k AS (SELECT p.doc_id, p.ci, p.ptext, f.n < 3 AS keep
              FROM p JOIN f USING (ptext))
        SELECT doc_id,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_dropped,
               coalesce(string_agg(CASE WHEN keep THEN ptext END, ' '
                                   ORDER BY ci), '') AS text
        FROM k GROUP BY doc_id
        """,
        "dup_span_stats": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, CAST(i AS BIGINT) AS s,
                     array_to_string(toks[i+1 : i+8], ' ') AS gtext
              FROM t, UNNEST(generate_series(0, len(toks) - 8)) AS u(i)
              WHERE len(toks) >= 8),
        f AS (SELECT gtext FROM g GROUP BY gtext HAVING count(*) >= 2),
        d AS (SELECT g.doc_id, g.s FROM g JOIN f USING (gtext)),
        cov AS (SELECT DISTINCT d.doc_id, CAST(p AS BIGINT) AS p
                FROM d, UNNEST(generate_series(d.s, d.s + 7)) AS u(p)),
        nt AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
        c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
              FROM cov GROUP BY doc_id)
        SELECT nt.doc_id, nt.n_tokens,
               coalesce(c.n_dup, 0) AS n_dup_tokens,
               round(coalesce(c.n_dup, 0)::DOUBLE / greatest(nt.n_tokens, 1),
                     6) AS dup_frac
        FROM nt LEFT JOIN c USING (doc_id)
        """,
        "embedding_cov": r"""
        WITH x AS (SELECT vec_id, CAST(i AS BIGINT) AS i,
                          CAST(embedding[i] AS DOUBLE) AS v
                   FROM embeddings,
                        unnest(generate_series(1, 64)) AS u(i)),
        m AS (SELECT i, avg(v) AS mu FROM x GROUP BY i),
        c AS (SELECT a.i AS i, b.i AS j,
                     sum(a.v * b.v) / count(*) AS s2
              FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i)
        SELECT c.i - 1 AS i, c.j - 1 AS j,
               round(c.s2 - ma.mu * mb.mu, 6) AS cov
        FROM c JOIN m ma ON ma.i = c.i JOIN m mb ON mb.i = c.j
        """,
        "dsir": r"""
        WITH t AS (SELECT doc_id, lang,
                          unnest(regexp_extract_all(text, '\S+')) AS tok
                   FROM documents),
        b AS (SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 1024
                       AS bkt
              FROM t),
        cnt AS (SELECT bkt, count(*) AS raw,
                       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt
                FROM b GROUP BY bkt),
        tot AS (SELECT CAST(sum(raw) AS DOUBLE) AS rawn,
                       CAST(sum(tgt) AS DOUBLE) AS tgtn
                FROM cnt),
        lr AS (SELECT bkt,
                      ln((tgt + 1.0) / (tgtn + 1024.0))
                        - ln((raw + 1.0) / (rawn + 1024.0)) AS w
               FROM cnt CROSS JOIN tot),
        s AS (SELECT b.doc_id, avg(lr.w) AS m
              FROM b JOIN lr USING (bkt) GROUP BY b.doc_id)
        SELECT d.doc_id, round(coalesce(s.m, 0.0), 6) AS dsir_logratio
        FROM documents d LEFT JOIN s USING (doc_id)
        """,
        "pdf_layout": r"""
        WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                      FROM documents),
        lines AS (
          SELECT doc_id, CAST(i - 1 AS BIGINT) AS ln,
                 array_to_string(t[(i-1)*6+1 : i*6], ' ') AS lt
          FROM toks,
               unnest(generate_series(1, CAST(ceil(len(t)/6.0) AS INT)))
                 AS u(i)),
        txt AS (
          SELECT doc_id, ln // 12 AS page, ln % 12 AS block_order,
                 'text' AS kind, lt AS text,
                 CAST(72 AS DOUBLE) AS x0,
                 CAST(60 + 16*(ln % 12) AS DOUBLE) AS y0,
                 round(72 + CAST(7.2 AS DOUBLE)*length(lt), 1) AS x1,
                 CAST(72 + 16*(ln % 12) AS DOUBLE) AS y1
          FROM lines),
        img AS (
          SELECT d.doc_id, CAST(0 AS BIGINT) AS page,
                 CAST(coalesce(c.n, 0) AS BIGINT) AS block_order,
                 'image' AS kind, '' AS text,
                 CAST(72 AS DOUBLE) AS x0, CAST(704 AS DOUBLE) AS y0,
                 CAST(136 AS DOUBLE) AS x1, CAST(752 AS DOUBLE) AS y1
          FROM documents d
          LEFT JOIN (SELECT doc_id, count(*) AS n FROM lines
                     WHERE ln < 12 GROUP BY doc_id) c USING (doc_id)
          WHERE d.doc_id % 2 = 0)
        SELECT * FROM txt UNION ALL SELECT * FROM img
        """,
        # audio_features: the WAV generator's waveform is integer-exact
        # (sources/av.py: synth_pcm), so the oracle restates every int16
        # sample with BIGINT arithmetic and derives the features through
        # the SAME single double expression the stage uses (exact-integer
        # sum of squares -> sqrt(ssq/n)/32768) — hash-exact, no float
        # association drift. Ray runs the real RIFF/WAVE codec; SQL runs
        # the generative model (the pdf_layout / url_canonical move).
        "audio_features": r"""
        WITH d AS (SELECT doc_id AS cid,
                          CAST(800 + 50*n_chars AS BIGINT) AS n,
                          2*(doc_id % 127) + 3 AS a
                   FROM documents),
        s AS (SELECT cid, n,
                list_transform(generate_series(0, n-1), t ->
                  (abs((a*t + cid) % 2048 - 1024) - 512) * 48
                  + ((1103515245*t + 12345*cid) % 97) - 48) AS pcm
              FROM d)
        SELECT CAST(cid AS VARCHAR) AS clip_id,
               n AS n_samples,
               round(n / 16000.0, 6) AS duration_sec,
               round(sqrt(CAST(list_sum(list_transform(pcm, x -> x*x))
                               AS DOUBLE) / n) / 32768.0, 6) AS rms,
               CAST(len(list_filter(generate_series(1, n-1),
                        i -> (pcm[i] < 0) <> (pcm[i+1] < 0))) AS BIGINT)
                 AS zero_crossings
        FROM s
        """,
        # video_frames: stride-2 sampling of 1 + doc_id % 4 PNG frames whose
        # pixels are the generator's (x*7 + y*13 + cid*31 + f*17) % 256
        # gradient — geometry and mean luma restated exactly in SQL; Ray
        # decodes the real PNG bytes.
        "video_frames": r"""
        WITH f AS (SELECT doc_id, u.i AS frame_idx
                   FROM documents, unnest([0, 2]) AS u(i)
                   WHERE u.i < 1 + doc_id % 4)
        SELECT CAST(doc_id AS VARCHAR) AS clip_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(16 AS INTEGER) AS width,
               CAST(12 AS INTEGER) AS height,
               round(list_sum(flatten(list_transform(generate_series(0, 11),
                 y -> list_transform(generate_series(0, 15),
                   x -> (x*7 + y*13 + doc_id*31 + frame_idx*17) % 256))))
                 / 192.0, 6) AS mean_luma
        FROM f
        """,
        # decode_variants: media rendered from each document's own text
        # (queries.decode_render_lines — ASCII-alnum tokens via an
        # RE2-shared regex, <=6 words of <=7 chars over <=2 lines); all
        # four decoders are exact on the glyph font, so every text column
        # equals the derived layout.
        "decode_variants": r"""
        WITH t AS (SELECT doc_id,
                    list_transform(
                      regexp_extract_all(text, '[0-9A-Za-z]+')[1:6],
                      x -> substr(upper(x), 1, 7)) AS toks
                   FROM documents),
        l AS (SELECT doc_id,
               CASE WHEN len(toks) = 0 THEN 'X0'
                    ELSE array_to_string(toks[1:3], ' ')
                      || CASE WHEN len(toks) > 3
                              THEN chr(10) || array_to_string(toks[4:6], ' ')
                              ELSE '' END
               END AS gt
              FROM t)
        SELECT CAST(doc_id AS VARCHAR) AS media_ref, gt AS gt_text,
               gt AS text_greedy, gt AS text_beam,
               gt AS text_attn, gt AS text_seg
        FROM l
        """,
        "html_extract": f"""
        WITH n AS (SELECT doc_id,
                          trim(regexp_replace(text, '{_WS}', ' ', 'g'),
                               ' ') AS main_text
                   FROM documents)
        SELECT doc_id, main_text,
               CAST(CASE WHEN main_text <> '' THEN 2 ELSE 1 END AS BIGINT)
                 AS n_blocks,
               CAST(CASE WHEN main_text <> '' THEN 1 ELSE 0 END AS BIGINT)
                 AS n_kept
        FROM n
        """,
        "normalize_text": f"""
        SELECT doc_id,
               trim(regexp_replace(nfc_normalize(text), '{_WS}', ' ', 'g'),
                    ' ') AS text_norm,
               CAST(CASE WHEN
                 trim(regexp_replace(nfc_normalize(text), '{_WS}', ' ', 'g'),
                      ' ') <> text THEN 1 ELSE 0 END AS BIGINT) AS changed
        FROM documents
        """,
        "active_users": r"""
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 1000000 // 86400 AS day
                   FROM events),
        f AS (SELECT user_id, day + i AS end_day,
                     max(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS is_dau
              FROM d, unnest(generate_series(0, 6)) AS u(i)
              GROUP BY user_id, end_day)
        SELECT end_day AS day, CAST(sum(is_dau) AS BIGINT) AS dau,
               CAST(count(*) AS BIGINT) AS wau
        FROM f GROUP BY end_day
        """,
        "q3_shipping": r"""
        SELECT l.l_orderkey,
               epoch_us(o.o_orderdate) // 1000000 AS o_orderdate_s,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
                 AS revenue
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l.l_orderkey, o_orderdate_s
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
        """,
        "user_event_seq": r"""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               string_agg(event_type, ','
                          ORDER BY epoch_us(ts), event_id) AS seq
        FROM events GROUP BY user_id
        """,
        "user_retention": r"""
        WITH d AS (SELECT DISTINCT user_id,
                          epoch_us(ts) // 1000000 // 86400 AS day
                   FROM events),
        f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
        SELECT f.cohort_day, d.day - f.cohort_day AS offset_days,
               CAST(count(*) AS BIGINT) AS n_users
        FROM d JOIN f USING (user_id)
        GROUP BY f.cohort_day, offset_days
        """,
        "user_lag": r"""
        SELECT event_id, user_id,
               CAST(row_number() OVER w - 1 AS BIGINT) AS row_idx,
               epoch_us(ts) - lag(epoch_us(ts)) OVER w AS prev_gap_us,
               lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us,
               round(value - lag(value) OVER w, 2) AS value_delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        """,
        "zscore_source": r"""
        WITH st AS (SELECT source, count(*) AS n,
                           CAST(sum(n_chars) AS BIGINT) AS s,
                           CAST(sum(n_chars * n_chars) AS BIGINT) AS ss
                    FROM documents GROUP BY source),
        v AS (SELECT source, n, s, ss,
                     sqrt(greatest(CAST(ss AS DOUBLE) / n
                          - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                          0.0)) AS sd
              FROM st)
        SELECT d.doc_id, d.source,
               round(CASE WHEN v.sd > 0
                          THEN (d.n_chars - CAST(v.s AS DOUBLE) / v.n) / v.sd
                          ELSE 0.0 END, 4) AS z_chars
        FROM documents d JOIN v USING (source)
        """,
        "dedup_keep_best": f"""
        WITH f AS (SELECT doc_id, n_chars, {_FP} AS fp FROM documents),
        r AS (SELECT doc_id, n_chars,
                     row_number() OVER (PARTITION BY fp
                                        ORDER BY n_chars DESC, doc_id) AS rn,
                     count(*) OVER (PARTITION BY fp) AS n_copies
              FROM f)
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_copies AS BIGINT) AS n_copies
        FROM r WHERE rn = 1
        """,
        "quality_gate": r"""
        WITH s AS (SELECT doc_id, lang,
          round(CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                / greatest(length(text), 1), 6) AS score
          FROM documents),
        m AS (SELECT lang, quantile_disc(score, 0.5) AS med
              FROM s GROUP BY lang)
        SELECT s.doc_id, s.lang, s.score
        FROM s JOIN m USING (lang) WHERE s.score >= m.med
        """,
        "dedup_rate": f"""
        WITH f AS (SELECT source, {_FP} AS fp FROM documents)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
               round(1 - count(DISTINCT fp)::DOUBLE / count(*), 6) AS dup_rate
        FROM f GROUP BY source
        """,
        "filter_funnel": r"""
        WITH t AS (SELECT source, lang,
                          len(regexp_extract_all(text, '\S+')) AS n_tok
                   FROM documents)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_lang,
               CAST(sum(CASE WHEN n_tok >= 30 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_len,
               CAST(sum(CASE WHEN lang = 'en' AND n_tok >= 30
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_both
        FROM t GROUP BY source
        """,
        "incremental_dedup": f"""
        WITH f AS (SELECT doc_id, {_FP} AS fp FROM documents),
        known AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 < 3),
        nw AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 >= 3)
        SELECT min(nw.doc_id) AS doc_id, nw.fp AS fp
        FROM nw WHERE nw.fp NOT IN (SELECT fp FROM known)
        GROUP BY nw.fp
        """,
        "minhash_sig": _SIGS_CTE
        + "SELECT doc_id, sig0, sig1, sig2, sig3 FROM sigs",
        "fuzzy_decontaminate": _SIGS_CTE
        + f""",
        bands AS (
          SELECT doc_id,
                 (((0*{_B} + sig0) % {_P}) * {_B} + sig1) % {_P} AS band0,
                 (((1*{_B} + sig2) % {_P}) * {_B} + sig3) % {_P} AS band1
          FROM sigs),
        ev AS (SELECT DISTINCT band FROM (
                 SELECT band0 AS band FROM bands WHERE doc_id % 97 = 0
                 UNION ALL
                 SELECT band1 AS band FROM bands WHERE doc_id % 97 = 0))
        SELECT doc_id,
               CAST((CASE WHEN band0 IN (SELECT band FROM ev)
                          THEN 1 ELSE 0 END)
                    + (CASE WHEN band1 IN (SELECT band FROM ev)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_band_hits,
               (band0 IN (SELECT band FROM ev)
                OR band1 IN (SELECT band FROM ev)) AS fuzzy_contaminated
        FROM bands WHERE doc_id % 97 <> 0
        """,
        "lsh_pairs": _SIGS_CTE
        + f""",
        bands AS (
          SELECT doc_id,
                 (((0*{_B} + sig0) % {_P}) * {_B} + sig1) % {_P} AS band
          FROM sigs
          UNION ALL
          SELECT doc_id,
                 (((1*{_B} + sig2) % {_P}) * {_B} + sig3) % {_P} AS band
          FROM sigs)
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
        """,
        "neardup_edit": _SIGS_CTE
        + f""",
        bands AS (
          SELECT doc_id,
                 (((0*{_B} + sig0) % {_P}) * {_B} + sig1) % {_P} AS band
          FROM sigs
          UNION ALL
          SELECT doc_id,
                 (((1*{_B} + sig2) % {_P}) * {_B} + sig3) % {_P} AS band
          FROM sigs),
        p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.doc_id < b.doc_id)
        SELECT p.doc_a, p.doc_b,
               CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
               round(1.0 - levenshtein(da.text, db.text)
                     / greatest(length(da.text), length(db.text), 1), 6)
                 AS edit_sim
        FROM p JOIN documents da ON da.doc_id = p.doc_a
               JOIN documents db ON db.doc_id = p.doc_b
        """,
        "pagerank": _SIGS_CTE
        + f""",
        bands AS (
          SELECT doc_id,
                 (((0*{_B} + sig0) % {_P}) * {_B} + sig1) % {_P} AS band
          FROM sigs
          UNION ALL
          SELECT doc_id,
                 (((1*{_B} + sig2) % {_P}) * {_B} + sig3) % {_P} AS band
          FROM sigs),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
                  UNION ALL SELECT doc_b, doc_a FROM cand),
        nn AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM edges),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        tp AS (SELECT (1 - CAST(0.85 AS DOUBLE)) / n AS t, n FROM nn),
        r0 AS (SELECT src AS node, 1.0 / tp.n AS r FROM deg CROSS JOIN tp),
        r1 AS (SELECT e.dst AS node,
                      any_value(tp.t) + 0.85 * sum(r0.r / deg.deg) AS r
               FROM edges e JOIN r0 ON r0.node = e.src
               JOIN deg ON deg.src = e.src CROSS JOIN tp
               GROUP BY e.dst),
        r2 AS (SELECT e.dst AS node,
                      any_value(tp.t) + 0.85 * sum(r1.r / deg.deg) AS r
               FROM edges e JOIN r1 ON r1.node = e.src
               JOIN deg ON deg.src = e.src CROSS JOIN tp
               GROUP BY e.dst),
        r3 AS (SELECT e.dst AS node,
                      any_value(tp.t) + 0.85 * sum(r2.r / deg.deg) AS r
               FROM edges e JOIN r2 ON r2.node = e.src
               JOIN deg ON deg.src = e.src CROSS JOIN tp
               GROUP BY e.dst)
        SELECT node AS doc_id, round(r, 6) AS rank FROM r3
        """,
        "winnow_pairs": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i AS pos,
                CAST(('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')),
                                     1, 15)) AS BIGINT) AS h
              FROM t, UNNEST(generate_series(1, greatest(len(toks)-4, 0)))
                      AS u(i)),
        n AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        win AS (SELECT g.doc_id, g.pos, n.n,
                min(h) OVER (PARTITION BY g.doc_id ORDER BY g.pos
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
                FROM g JOIN n USING (doc_id)),
        fps AS (SELECT DISTINCT doc_id, fp FROM win
                WHERE pos <= greatest(n - 3, 1))
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        """,
        "split_leakage": _SIGS_CTE
        + f""",
        bands AS (
          SELECT doc_id,
                 (((0*{_B} + sig0) % {_P}) * {_B} + sig1) % {_P} AS band
          FROM sigs
          UNION ALL
          SELECT doc_id,
                 (((1*{_B} + sig2) % {_P}) * {_B} + sig3) % {_P} AS band
          FROM sigs),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
        shd AS (SELECT doc_id,
          CASE WHEN len(toks) >= 3
               THEN list_distinct(list_transform(generate_series(1, len(toks)-2),
                                  i -> array_to_string(toks[i:i+2], ' ')))
               ELSE CAST([] AS VARCHAR[]) END AS s
          FROM t),
        sp AS (SELECT doc_id,
          CASE WHEN bkt < 8 THEN 'train'
               WHEN bkt < 9 THEN 'val' ELSE 'test' END AS split
          FROM (SELECT doc_id,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) % 10 AS bkt
                FROM documents)),
        v AS (SELECT c.doc_a, c.doc_b,
          round(CASE
            WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
            WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
            ELSE CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s)))
          END, 6) AS jaccard,
          sa.split AS split_a, sb.split AS split_b
          FROM cand c
          JOIN shd a ON a.doc_id = c.doc_a
          JOIN shd b ON b.doc_id = c.doc_b
          JOIN sp sa ON sa.doc_id = c.doc_a
          JOIN sp sb ON sb.doc_id = c.doc_b)
        SELECT doc_a, doc_b, jaccard, split_a, split_b FROM v
        WHERE jaccard >= 0.5 AND split_a <> split_b
        """,
        "dedup_clusters": _SIGS_CTE.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
        + f""",
        bands AS (
          SELECT doc_id,
                 (((0*{_B} + sig0) % {_P}) * {_B} + sig1) % {_P} AS band
          FROM sigs
          UNION ALL
          SELECT doc_id,
                 (((1*{_B} + sig2) % {_P}) * {_B} + sig3) % {_P} AS band
          FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(node, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node)
        SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
        """,
        "curate": _SIGS_CTE.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
        + f""",
        bands AS (
          SELECT doc_id,
                 (((0*{_B} + sig0) % {_P}) * {_B} + sig1) % {_P} AS band
          FROM sigs
          UNION ALL
          SELECT doc_id,
                 (((1*{_B} + sig2) % {_P}) * {_B} + sig3) % {_P} AS band
          FROM sigs),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(node, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node),
        cc AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
        dupdrop AS (SELECT doc_id FROM cc WHERE cluster_id <> doc_id),
        g5 AS (
          SELECT doc_id, toks[i] || \' \' || toks[i+1] || \' \' || toks[i+2] || \' \'
                         || toks[i+3] || \' \' || toks[i+4] AS ngram
          FROM t, UNNEST(generate_series(1, greatest(len(toks)-4, 0))) AS u(i)),
        ev AS (SELECT DISTINCT ngram FROM g5 WHERE doc_id % 97 = 0),
        contam AS (
          SELECT DISTINCT g5.doc_id FROM g5 JOIN ev USING(ngram)
          WHERE g5.doc_id % 97 <> 0)
        SELECT d.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens, d.text
        FROM documents d JOIN t ON d.doc_id = t.doc_id
        WHERE d.lang = \'en\' AND len(t.toks) >= 30 AND d.doc_id % 97 <> 0
          AND d.doc_id NOT IN (SELECT doc_id FROM dupdrop)
          AND d.doc_id NOT IN (SELECT doc_id FROM contam)
        """,
        "jaccard_adjacent": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        sh AS (SELECT doc_id,
          CASE WHEN len(toks) >= 3
               THEN list_distinct(list_transform(generate_series(1, len(toks)-2),
                                  i -> array_to_string(toks[i:i+2], ' ')))
               ELSE CAST([] AS VARCHAR[]) END AS s
          FROM t)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          round(CASE
            WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
            WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
            ELSE CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE)
                 / len(list_distinct(list_concat(a.s, b.s)))
          END, 6) AS jaccard
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
        "containment": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        sh AS (SELECT doc_id,
          CASE WHEN len(toks) >= 3
               THEN list_distinct(list_transform(generate_series(1, len(toks)-2),
                                  i -> array_to_string(toks[i:i+2], ' ')))
               ELSE CAST([] AS VARCHAR[]) END AS s
          FROM t)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          round(CASE WHEN len(a.s) = 0 THEN 0.0
            ELSE CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE)
                 / len(a.s) END, 6) AS a_in_b,
          round(CASE WHEN len(b.s) = 0 THEN 0.0
            ELSE CAST(len(list_distinct(list_intersect(a.s, b.s))) AS DOUBLE)
                 / len(b.s) END, 6) AS b_in_a
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
        "embedding_dups": "WITH " + _EMB_CAND_CTE + """
        SELECT c.va AS vec_a, c.vb AS vec_b,
               round(list_cosine_similarity(ea.v, eb.v), 6) AS cosine
        FROM cand c
        JOIN e ea ON ea.vec_id = c.va
        JOIN e eb ON eb.vec_id = c.vb
        WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3
        """,
        "embedding_clusters": "WITH RECURSIVE " + _EMB_CAND_CTE + """,
        pairs AS (
          SELECT c.va, c.vb
          FROM cand c
          JOIN e ea ON ea.vec_id = c.va
          JOIN e eb ON eb.vec_id = c.vb
          WHERE list_cosine_similarity(ea.v, eb.v) >= 0.3),
        edges AS (
          SELECT va AS src, vb AS dst FROM pairs
          UNION ALL SELECT vb, va FROM pairs),
        reach(node, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT g.src, reach.r FROM edges g JOIN reach ON g.dst = reach.node)
        SELECT node AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY node
        """,
        "embedding_centroids": """
        WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT label, CAST(p AS BIGINT) AS pos, round(avg(v[p]), 4) AS val
        FROM e, unnest(generate_series(1, len(v))) AS u(p)
        GROUP BY label, p
        """,
        "ann_topk": """
        WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id < 4),
        s AS (SELECT q.qid, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS sim
              FROM q, embeddings e),
        r AS (SELECT qid, vec_id, sim,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
              FROM s)
        SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vec_id,
               round(sim, 6) AS sim
        FROM r WHERE rn <= 5
        """,
        "ann_filtered": """
        WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id < 4),
        s AS (SELECT q.qid, e.vec_id,
                     list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS sim
              FROM q, embeddings e WHERE e.label = 3),
        r AS (SELECT qid, vec_id, sim,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
              FROM s)
        SELECT qid AS query_id, CAST(rn AS BIGINT) AS rank, vec_id,
               round(sim, 6) AS sim
        FROM r WHERE rn <= 5
        """,
        "knn_graph": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
        s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                     list_cosine_similarity(a.ve, b.ve) AS sim
              FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        r AS (SELECT vec_id, nbr_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, nbr_id) AS rn
              FROM s)
        SELECT vec_id, CAST(rn AS BIGINT) AS rank, nbr_id,
               round(sim, 6) AS sim
        FROM r WHERE rn <= 3
        """,
        # knn_graph_auto routes exact below KNN_EXACT_MAX_ROWS (always true
        # at sf table sizes), so its oracle is knn_graph's SQL; the routing
        # threshold and the IVF route are pinned in unit tests
        "knn_graph_auto": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
        s AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
                     list_cosine_similarity(a.ve, b.ve) AS sim
              FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        r AS (SELECT vec_id, nbr_id, sim,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, nbr_id) AS rn
              FROM s)
        SELECT vec_id, CAST(rn AS BIGINT) AS rank, nbr_id,
               round(sim, 6) AS sim
        FROM r WHERE rn <= 3
        """,
        "simhash": r"""
        WITH t AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
                   FROM documents),
        h AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS hv
              FROM t),
        bits AS (
          SELECT doc_id, i,
                 sum(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS vote
          FROM h, unnest(generate_series(0, 63)) AS u(i)
          GROUP BY doc_id, i),
        vals AS (
          SELECT doc_id,
                 bit_or(CASE WHEN vote > 0
                             THEN (CAST(1 AS UBIGINT) << i)
                             ELSE CAST(0 AS UBIGINT) END) AS sh
          FROM bits GROUP BY doc_id)
        SELECT d.doc_id,
               lpad(lower(to_hex(coalesce(v.sh, 0))), 16, '0') AS simhash
        FROM documents d LEFT JOIN vals v ON d.doc_id = v.doc_id
        """,
        "ngram_topk": r"""
        WITH t AS (SELECT regexp_extract_all(text, '\S+') AS toks FROM documents),
        g AS (SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS ngram
              FROM t, UNNEST(generate_series(1, greatest(len(toks)-2, 0))) AS u(i))
        SELECT ngram, count(*) AS cnt FROM g GROUP BY ngram
        ORDER BY cnt DESC, ngram LIMIT 20
        """,
        "decontaminate": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        g AS (SELECT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                             || toks[i+3] || ' ' || toks[i+4] AS ngram
              FROM t, UNNEST(generate_series(1, greatest(len(toks)-4, 0))) AS u(i)),
        dg AS (SELECT DISTINCT doc_id, ngram FROM g WHERE doc_id % 97 <> 0),
        ev AS (SELECT DISTINCT ngram FROM g WHERE doc_id % 97 = 0)
        SELECT d.doc_id,
               CAST(count(ev.ngram) AS BIGINT) AS n_overlap,
               count(ev.ngram) > 0 AS contaminated
        FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
        LEFT JOIN dg ON d.doc_id = dg.doc_id
        LEFT JOIN ev ON dg.ngram = ev.ngram
        GROUP BY d.doc_id
        """,
        "repetition": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS ngram
              FROM t, UNNEST(generate_series(1, greatest(len(toks)-1, 0))) AS u(i)),
        c AS (SELECT doc_id, ngram, count(*) AS c FROM g GROUP BY doc_id, ngram),
        a AS (SELECT doc_id, sum(c) AS tot, count(*) AS dis, max(c) AS mx
              FROM c GROUP BY doc_id)
        SELECT d.doc_id,
          round(CAST(coalesce(a.tot, 0) - coalesce(a.dis, 0) AS DOUBLE)
                / greatest(coalesce(a.tot, 0), 1), 6) AS dup_frac,
          round(CAST(coalesce(a.mx, 0) AS DOUBLE)
                / greatest(coalesce(a.tot, 0), 1), 6) AS top_frac
        FROM documents d LEFT JOIN a USING (doc_id)
        """,
        "tfidf": r"""
        WITH t AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
                   FROM documents),
        df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
        n AS (SELECT count(*) AS n FROM documents),
        s AS (SELECT t.doc_id, avg(ln((n.n + 1.0) / (df.df + 1.0))) AS m
              FROM t JOIN df USING (tok) CROSS JOIN n GROUP BY t.doc_id)
        SELECT d.doc_id, round(coalesce(s.m, 0.0), 6) AS mean_idf
        FROM documents d LEFT JOIN s USING (doc_id)
        """,
        "kie_rowcol": r"""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok,
                 generate_subscripts(l, 1) - 1 AS i
          FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                FROM documents)
        ),
        cells AS (
          SELECT doc_id, i, tok,
            i // 4 AS gt_row, i % 4 AS gt_col,
            (i // 4 * 40 + 20 +
             CASE WHEN length(tok) = 1 THEN 25 ELSE 0 END) // 40
              AS pred_row,
            ((i % 4) * 100 + 50 +
             CASE WHEN length(tok) = 8 THEN 60 ELSE 0 END) // 100
              AS pred_col
          FROM toks
        ),
        pr AS (SELECT doc_id, string_agg(CAST(i AS VARCHAR), ',' ORDER BY i) AS g
               FROM cells GROUP BY doc_id, pred_row),
        gr AS (SELECT doc_id, string_agg(CAST(i AS VARCHAR), ',' ORDER BY i) AS g
               FROM cells GROUP BY doc_id, gt_row),
        pcg AS (SELECT doc_id, string_agg(CAST(i AS VARCHAR), ',' ORDER BY i) AS g
                FROM cells GROUP BY doc_id, pred_col),
        gcg AS (SELECT doc_id, string_agg(CAST(i AS VARCHAR), ',' ORDER BY i) AS g
                FROM cells GROUP BY doc_id, gt_col),
        stats AS (
          SELECT doc_id, count(*) AS n_cells,
            sum(CASE WHEN regexp_full_match(tok, '[0-9]+([.,][0-9]+)?')
                     THEN 1 ELSE 0 END) AS n_num,
            sum(CASE WHEN tok IN ('table', 'line', 'row')
                     THEN 1 ELSE 0 END) AS n_obj
          FROM cells GROUP BY doc_id
        ),
        rtp AS (SELECT doc_id, count(*) AS tp FROM
                  (SELECT doc_id, g FROM pr INTERSECT SELECT doc_id, g FROM gr)
                GROUP BY doc_id),
        ctp AS (SELECT doc_id, count(*) AS tp FROM
                  (SELECT doc_id, g FROM pcg INTERSECT SELECT doc_id, g FROM gcg)
                GROUP BY doc_id),
        rp AS (SELECT doc_id, count(*) AS n FROM pr GROUP BY doc_id),
        rg AS (SELECT doc_id, count(*) AS n FROM gr GROUP BY doc_id),
        cp AS (SELECT doc_id, count(*) AS n FROM pcg GROUP BY doc_id),
        cg AS (SELECT doc_id, count(*) AS n FROM gcg GROUP BY doc_id),
        f AS (
          SELECT s.doc_id, s.n_cells, s.n_num, s.n_obj,
            2.0 * coalesce(rtp.tp, 0) / (rp.n + rg.n) AS rf,
            2.0 * coalesce(ctp.tp, 0) / (cp.n + cg.n) AS cf
          FROM stats s
          JOIN rp USING (doc_id) JOIN rg USING (doc_id)
          JOIN cp USING (doc_id) JOIN cg USING (doc_id)
          LEFT JOIN rtp USING (doc_id) LEFT JOIN ctp USING (doc_id)
        )
        SELECT doc_id, CAST(n_cells AS BIGINT) AS n_cells,
               CAST(n_num AS BIGINT) AS n_num,
               CAST(n_obj AS BIGINT) AS n_obj,
               round(rf, 4) AS row_f1, round(cf, 4) AS col_f1,
               round((rf + cf) / 2, 4) AS rowcol_f1
        FROM f
        """,
        "tfidf_capped": r"""
        WITH t AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
                   FROM documents),
        df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t GROUP BY tok),
        cap AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 32),
        n AS (SELECT count(*) AS n FROM documents),
        s AS (SELECT t.doc_id,
                     avg(ln((n.n + 1.0) / (coalesce(cap.df, 0) + 1.0))) AS m
              FROM t LEFT JOIN cap USING (tok) CROSS JOIN n GROUP BY t.doc_id)
        SELECT d.doc_id, round(coalesce(s.m, 0.0), 6) AS mean_idf
        FROM documents d LEFT JOIN s USING (doc_id)
        """,
        "hash_sample": """
        WITH b AS (SELECT doc_id, lang, source,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 10 AS bucket
          FROM documents)
        SELECT doc_id, lang, source, bucket FROM b WHERE bucket < 3
        """,
        "asof_join": """
        WITH l AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
                   FROM events WHERE event_type = 'click'),
        r AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
              FROM events WHERE event_type = 'view'),
        j AS (SELECT l.event_id, l.user_id, l.ts_us,
                     r.event_id AS matched_id, r.ts_us AS matched_ts_us,
                     row_number() OVER (PARTITION BY l.event_id
                        ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
              FROM l JOIN r ON l.user_id = r.user_id AND r.ts_us <= l.ts_us)
        SELECT event_id, user_id, ts_us, matched_id, matched_ts_us,
               ts_us - matched_ts_us AS gap_us
        FROM j WHERE rn = 1
        """,
        "group_topk": """
        WITH r AS (SELECT doc_id, lang, n_chars,
          row_number() OVER (PARTITION BY lang
                             ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents)
        SELECT doc_id, lang, n_chars, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 3
        """,
        "len_quantiles": """
        SELECT lang, count(*) AS n,
               quantile_disc(n_chars, 0.5) AS p50,
               quantile_disc(n_chars, 0.9) AS p90
        FROM documents GROUP BY lang
        """,
        "sliding_window": """
        WITH e AS (SELECT CAST(epoch_us(ts)//1000000 AS BIGINT) AS s,
                          event_type, value FROM events),
        w AS (SELECT (s//1800)*1800 - k*1800 AS window_start, event_type, value
              FROM e, UNNEST(generate_series(0, 1)) AS u(k)
              WHERE (s//1800)*1800 - k*1800 > s - 3600)
        SELECT window_start, event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM w GROUP BY window_start, event_type
        """,
        "range_join": """
        WITH bands(lo, hi, band) AS (VALUES
          (0.0, 5.0, 'low'), (5.0, 25.0, 'mid'),
          (25.0, 100.0, 'high'), (100.0, 1e18, 'top'))
        SELECT e.event_id, e.value, b.band
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        """,
        "weighted_sample": """
        WITH b AS (SELECT doc_id, source,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 10 AS bucket
          FROM documents)
        SELECT doc_id, source, bucket FROM b
        WHERE bucket < CASE WHEN CAST(substr(source, 4) AS BIGINT) < 10
                            THEN 2 ELSE 5 END
        """,
        "shared_grams": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS ngram
              FROM t, UNNEST(generate_series(1, greatest(len(toks)-2, 0))) AS u(i)),
        df AS (SELECT ngram, count(DISTINCT doc_id) AS df FROM g GROUP BY ngram),
        per AS (SELECT g.doc_id, count(*) AS tot,
                       sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS shared
                FROM g JOIN df USING (ngram) GROUP BY g.doc_id)
        SELECT d.doc_id,
               round(CAST(coalesce(per.shared, 0) AS DOUBLE)
                     / greatest(coalesce(per.tot, 0), 1), 6) AS shared_frac
        FROM documents d LEFT JOIN per USING (doc_id)
        """,
        "bpe_tokens": r"""
        SELECT event_id,
               CAST(len(regexp_extract_all(props,
                    ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS BIGINT)
                 AS n_bpe
        FROM events
        """,
        "distinct_users": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type
        """,
        "funnel": """
        WITH m AS (SELECT user_id,
            min(CASE WHEN event_type = 'view'
                     THEN CAST(epoch_us(ts) AS BIGINT) END) AS v,
            min(CASE WHEN event_type = 'click'
                     THEN CAST(epoch_us(ts) AS BIGINT) END) AS c,
            min(CASE WHEN event_type = 'purchase'
                     THEN CAST(epoch_us(ts) AS BIGINT) END) AS p
          FROM events GROUP BY user_id)
        SELECT
          CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT) AS n_view,
          CAST(count(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND c > v
                          THEN 1 END) AS BIGINT) AS n_click_after_view,
          CAST(count(CASE WHEN v IS NOT NULL AND c IS NOT NULL AND c > v
                          AND p IS NOT NULL AND p > c
                          THEN 1 END) AS BIGINT) AS n_purchase_after_click
        FROM m
        """,
        "rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
        """,
        "anti_join": """
        SELECT event_id, user_id, event_type FROM events
        WHERE user_id NOT IN (
          SELECT user_id FROM events
          WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-08')
        """,
        "semi_join": """
        SELECT event_id, user_id, event_type FROM events
        WHERE user_id IN (
          SELECT user_id FROM events
          WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-08')
        """,
        "mix_strata": """
        WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
        n AS (SELECT sum(c) AS n, sum(pow(CAST(c AS DOUBLE), 0.5)) AS sw
              FROM c),
        t AS (SELECT c.lang,
                CAST(floor(least(1.0,
                      0.5 * n.n * pow(CAST(c.c AS DOUBLE), 0.5) / n.sw / c.c)
                     * 1152921504606846976.0) AS BIGINT) AS thr
              FROM c CROSS JOIN n)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN t USING (lang)
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) < t.thr
        """,
        "stratified_sample": """
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 row_number() OVER (PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents) WHERE rn <= 10
        """,
        "inverted_index": r"""
        WITH g AS (SELECT doc_id,
                     unnest(regexp_extract_all(text, '\S+')) AS token
                   FROM documents),
        t AS (SELECT DISTINCT doc_id, token FROM g)
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list_sort(list(doc_id))[1:5], ',') AS postings
        FROM t GROUP BY token HAVING count(*) >= 2
        """,
        "passage_dedup": r"""
        WITH d AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                   FROM documents),
        c0 AS (SELECT doc_id, l,
                 unnest(generate_series(0,
                   CAST(ceil(len(l) / 20.0) AS BIGINT) - 1)) AS ci
               FROM d),
        c AS (SELECT doc_id, ci,
                md5(array_to_string(l[(ci*20+1):(ci*20+20)], ' ')) AS h
              FROM c0),
        own AS (SELECT h, min(doc_id * 1000000 + ci) AS firstkey
                FROM c GROUP BY h)
        SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_passages,
               CAST(sum(CASE WHEN c.doc_id * 1000000 + c.ci > o.firstkey
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
               round(CAST(sum(CASE WHEN c.doc_id * 1000000 + c.ci > o.firstkey
                        THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS dup_frac
        FROM c JOIN own o USING (h)
        GROUP BY c.doc_id
        """,
        "source_overlap": r"""
        WITH f AS (SELECT doc_id, source,
                   md5(array_to_string(regexp_extract_all(text, '\S+')[1:5],
                                       ' ')) AS fp
                   FROM documents)
        SELECT least(a.source, b.source) AS src_a,
               greatest(a.source, b.source) AS src_b,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM f a JOIN f b
          ON a.fp = b.fp AND a.doc_id < b.doc_id AND a.source <> b.source
        GROUP BY 1, 2
        """,
        "chunk_windows": r"""
        WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
                   FROM documents)
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
               CAST(least(32, len(toks) - i*24) AS BIGINT) AS n_tokens,
               array_to_string(toks[i*24+1 : i*24+32], ' ') AS chunk_text
        FROM t, UNNEST(generate_series(0,
                 CAST(ceil(len(toks) / 24.0) AS BIGINT) - 1)) AS u(i)
        WHERE len(toks) > 0
        """,
        "epoch_shuffle": """
        SELECT doc_id,
               CAST(row_number() OVER (
                    ORDER BY md5('13:' || CAST(doc_id AS VARCHAR)), doc_id
               ) - 1 AS BIGINT) AS shuffle_rank
        FROM documents
        """,
        "length_outliers": """
        WITH s AS (SELECT lang, avg(n_chars) AS m,
                          stddev_samp(n_chars) AS sd, count(*) AS c
                   FROM documents GROUP BY lang)
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d JOIN s USING (lang)
        WHERE s.c > 1 AND abs(d.n_chars - s.m) > 1.5 * s.sd
        """,
        "seq_pack": r"""
        WITH RECURSIVE toks AS (
          SELECT source, doc_id,
                 CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents),
        pack AS (
          SELECT source, doc_id, rn, n,
                 CAST(0 AS BIGINT) AS seq_idx, n AS fill
          FROM toks WHERE rn = 1
          UNION ALL
          SELECT t.source, t.doc_id, t.rn, t.n,
                 CASE WHEN p.fill + t.n > 200 THEN p.seq_idx + 1
                      ELSE p.seq_idx END,
                 CASE WHEN p.fill + t.n > 200 THEN t.n
                      ELSE p.fill + t.n END
          FROM toks t JOIN pack p
            ON t.source = p.source AND t.rn = p.rn + 1)
        SELECT source, doc_id, n AS n_tokens, seq_idx FROM pack
        """,
        "simhash_dups": r"""
        WITH t AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
                   FROM documents),
        h AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS hv
              FROM t),
        bits AS (
          SELECT doc_id, i,
                 sum(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS vote
          FROM h, unnest(generate_series(0, 63)) AS u(i)
          GROUP BY doc_id, i),
        vals AS (
          SELECT doc_id,
                 bit_or(CASE WHEN vote > 0
                             THEN (CAST(1 AS UBIGINT) << i)
                             ELSE CAST(0 AS UBIGINT) END) AS sh
          FROM bits GROUP BY doc_id),
        sh AS (SELECT d.doc_id, coalesce(v.sh, 0) AS sh
               FROM documents d LEFT JOIN vals v USING (doc_id))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh, b.sh)) <= 3
        """,
        "interval_merge": r"""
        WITH iv AS (
          SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
                 CAST(epoch_us(ts) AS BIGINT)
                   + CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)
                     * 1000000 AS e
          FROM events),
        o AS (SELECT user_id, s, e,
                max(e) OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max
              FROM iv),
        g AS (SELECT user_id, s, e,
                sum(CASE WHEN prev_max IS NULL OR s > prev_max
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
              FROM o)
        SELECT user_id, CAST(island AS BIGINT) AS island,
               min(s) AS start_us, max(e) AS end_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM g GROUP BY user_id, island
        """,
        "interval_merge_salted": r"""
        WITH iv AS (
          SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS s,
                 CAST(epoch_us(ts) AS BIGINT)
                   + CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)
                     * 1000000 AS e
          FROM events),
        o AS (SELECT user_id, s, e,
                max(e) OVER (PARTITION BY user_id ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prev_max
              FROM iv),
        g AS (SELECT user_id, s, e,
                sum(CASE WHEN prev_max IS NULL OR s > prev_max
                         THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS island
              FROM o)
        SELECT user_id, CAST(island AS BIGINT) AS island,
               min(s) AS start_us, max(e) AS end_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM g GROUP BY user_id, island
        """,
        "readability": r"""
        WITH m AS (
          SELECT doc_id,
            len(regexp_extract_all(text, '\S+')) AS n_words,
            len(regexp_extract_all(text, '[.!?]')) AS n_sentences,
            len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS n_syllables
          FROM documents)
        SELECT doc_id,
          CAST(n_words AS BIGINT) AS n_words,
          CAST(n_sentences AS BIGINT) AS n_sentences,
          CAST(n_syllables AS BIGINT) AS n_syllables,
          round(206.835
                - 1.015 * (greatest(n_words, 1) / greatest(n_sentences, 1))
                - 84.6 * (n_syllables / greatest(n_words, 1)), 6) AS flesch
        FROM m
        """,
        "gopher_rules": rf"""
        WITH base AS (
          SELECT doc_id, text,
                 regexp_extract_all(text, '\S+') AS toks,
                 str_split(text, chr(10)) AS lines
          FROM documents),
        m AS (
          SELECT doc_id,
            len(toks) AS n_tok,
            CAST(len(array_to_string(toks, '')) AS DOUBLE)
              / greatest(len(toks), 1) AS mean_len,
            ((length(text) - length(replace(text, '#', '')))
             + (length(text) - length(replace(text, '...', ''))) / 3.0)
              / greatest(len(toks), 1) AS symbol_ratio,
            CAST(len(list_filter(lines, x -> starts_with(trim(x), '- ')
                                          OR starts_with(trim(x), '* ')))
                 AS DOUBLE) / greatest(len(lines), 1) AS bullet_ratio,
            CAST(len(list_filter(lines, x -> ends_with(trim(x), '...')))
                 AS DOUBLE) / greatest(len(lines), 1) AS ellipsis_ratio,
            len(list_filter(toks, x -> lower(x) IN ({_EN_SW}))) AS n_stop
          FROM base)
        SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
          round(mean_len, 6) AS mean_len,
          round(symbol_ratio, 6) AS symbol_ratio,
          round(bullet_ratio, 6) AS bullet_ratio,
          round(ellipsis_ratio, 6) AS ellipsis_ratio,
          CAST(n_stop AS BIGINT) AS n_stop,
          (n_tok >= 50 AND n_tok <= 100000
           AND mean_len >= 3 AND mean_len <= 10
           AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
           AND ellipsis_ratio <= 0.3 AND n_stop >= 2) AS "pass"
        FROM m
        """,
        "oov_rate": r"""
        WITH t AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
                   FROM documents),
        v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM t GROUP BY tok
                               ORDER BY c DESC, tok LIMIT 200)),
        p AS (SELECT doc_id, count(*) AS n,
                     count(*) FILTER (tok NOT IN (SELECT tok FROM v)) AS o
              FROM t GROUP BY doc_id)
        SELECT d.doc_id, CAST(coalesce(p.n, 0) AS BIGINT) AS n_tokens,
               round(CAST(coalesce(p.o, 0) AS DOUBLE)
                     / greatest(coalesce(p.n, 0), 1), 6) AS oov
        FROM documents d LEFT JOIN p USING (doc_id)
        """,
        "source_divergence": r"""
        WITH t AS (SELECT source, unnest(regexp_extract_all(text, '\S+')) AS tok
                   FROM documents),
        s AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok),
        tot AS (SELECT sum(c) AS n FROM s),
        g AS (SELECT tok, sum(c) AS cg FROM s GROUP BY tok),
        sn AS (SELECT source, sum(c) AS ns FROM s GROUP BY source)
        SELECT s.source, CAST(sn.ns AS BIGINT) AS n_tokens,
               round(sum((s.c / sn.ns) * ln((s.c / sn.ns) / (g.cg / tot.n))), 6)
                 AS kl
        FROM s JOIN g USING (tok) JOIN sn USING (source) CROSS JOIN tot
        GROUP BY s.source, sn.ns
        """,
        "hash_split": """
        WITH b AS (SELECT doc_id,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 10 AS bucket
          FROM documents)
        SELECT doc_id, bucket,
               CASE WHEN bucket < 8 THEN 'train'
                    WHEN bucket < 9 THEN 'val'
                    ELSE 'test' END AS split
        FROM b
        """,
        "pmi_bigrams": r"""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
          FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                FROM documents)
        ),
        big AS (
          SELECT a.tok AS w1, b.tok AS w2
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
        n AS (SELECT sum(c) AS n FROM bc),
        cl AS (SELECT w1, sum(c) AS cl FROM bc GROUP BY w1),
        cr AS (SELECT w2, sum(c) AS cr FROM bc GROUP BY w2),
        scored AS (
          SELECT bc.w1, bc.w2, CAST(bc.c AS BIGINT) AS c,
                 round(ln(bc.c * n.n / (cl.cl * cr.cr)), 6) AS pmi
          FROM bc JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN n
          WHERE bc.c >= 5
        )
        SELECT w1, w2, c, pmi FROM scored
        ORDER BY pmi DESC, w1, w2 LIMIT 20
        """,
        "bigram_lm": r"""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
          FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                FROM documents)
        ),
        big AS (
          SELECT a.doc_id, a.tok AS w1, b.tok AS w2
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
        cu AS (SELECT w1, sum(c) AS cu FROM bc GROUP BY w1),
        vv AS (SELECT count(*) AS v FROM
                 (SELECT w1 AS t FROM bc UNION SELECT w2 FROM bc)),
        scored AS (
          SELECT big.doc_id, ln((bc.c + 0.5) / (cu.cu + 0.5 * vv.v)) AS lp
          FROM big JOIN bc USING (w1, w2) JOIN cu USING (w1) CROSS JOIN vv
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(lp), 6) AS avg_logp
        FROM scored GROUP BY doc_id
        """,
        "bigram_lm_capped": r"""
        WITH toks0 AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
          FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                FROM documents)
        ),
        uni AS (SELECT tok, count(*) AS c FROM toks0 GROUP BY tok),
        vocab AS (SELECT tok FROM uni ORDER BY c DESC, tok LIMIT 16),
        toks AS (
          SELECT doc_id, pos,
                 CASE WHEN tok IN (SELECT tok FROM vocab) THEN tok
                      ELSE '<unk>' END AS tok
          FROM toks0
        ),
        big AS (
          SELECT a.doc_id, a.tok AS w1, b.tok AS w2
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY w1, w2),
        cu AS (SELECT w1, sum(c) AS cu FROM bc GROUP BY w1),
        vv AS (SELECT count(*) AS v FROM
                 (SELECT w1 AS t FROM bc UNION SELECT w2 FROM bc)),
        scored AS (
          SELECT big.doc_id, ln((bc.c + 0.5) / (cu.cu + 0.5 * vv.v)) AS lp
          FROM big JOIN bc USING (w1, w2) JOIN cu USING (w1) CROSS JOIN vv
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(lp), 6) AS avg_logp
        FROM scored GROUP BY doc_id
        """,
        "ner_f1": r"""
        WITH toks AS (
          SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
          FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS l
                FROM documents)
        ),
        gt AS (
          SELECT doc_id,
                 CASE WHEN tok IN ('table','line','row') THEN 'OBJ'
                      ELSE 'ADJ' END AS category,
                 pos AS s, pos AS e
          FROM toks
          WHERE tok IN ('table','line','row','fast','slow','big','small')
        ),
        pred AS (
          SELECT doc_id,
                 CASE WHEN tok IN ('table','line') THEN 'OBJ'
                      ELSE 'ADJ' END AS category,
                 pos AS s, pos AS e
          FROM toks WHERE tok IN ('table','line','fast','slow','value')
        ),
        corr AS (
          SELECT p.category FROM pred p
          WHERE EXISTS (SELECT 1 FROM gt g
                        WHERE g.doc_id = p.doc_id AND g.category = p.category
                          AND g.s = p.s AND g.e = p.e)
        ),
        u AS (
          SELECT o.category, o.n_gt,
                 coalesce(f.n_pred, 0) AS n_pred,
                 coalesce(r.n_correct, 0) AS n_correct
          FROM (SELECT category, count(*) AS n_gt FROM gt GROUP BY category) o
          LEFT JOIN (SELECT category, count(*) AS n_pred FROM pred
                     GROUP BY category) f USING (category)
          LEFT JOIN (SELECT category, count(*) AS n_correct FROM corr
                     GROUP BY category) r USING (category)
          UNION ALL
          SELECT 'all', (SELECT count(*) FROM gt),
                 (SELECT count(*) FROM pred), (SELECT count(*) FROM corr)
        ),
        v AS (
          SELECT category, n_gt, n_pred, n_correct,
            CASE WHEN n_pred = 0 THEN 0.0
                 ELSE CAST(n_correct AS DOUBLE) / n_pred END AS p,
            CASE WHEN n_gt = 0 THEN 0.0
                 ELSE CAST(n_correct AS DOUBLE) / n_gt END AS r
          FROM u
        )
        SELECT category, CAST(n_gt AS BIGINT) AS n_gt,
               CAST(n_pred AS BIGINT) AS n_pred,
               CAST(n_correct AS BIGINT) AS n_correct,
               round(p, 6) AS prec, round(r, 6) AS rec,
               round(CASE WHEN p + r = 0 THEN 0.0
                     ELSE 2 * p * r / (p + r) END, 6) AS f1
        FROM v ORDER BY category
        """,
        # no oracle: flagship_extract / ocr_eval (OCR semantics),
        # ann_ivf (approximate by construction), quantile_sketch
        # (approximate by construction) -> rows-only checks
    }
    # the salted two-phase sessionize must equal the plain one exactly —
    # same oracle proves it value-for-value
    out["sessionize_salted"] = out["sessionize"]
    # URL family: the synthetic crawl URL is pure string concatenation over
    # (doc_id, source), so the oracle states the raw URL and the expected
    # canonical form directly from the generative model (same move as
    # pdf_layout) while the Ray path does the real RFC-3986 parsing.
    out["url_canonical"] = """
        WITH u AS (
          SELECT doc_id, source,
            CASE WHEN doc_id % 2 = 1 THEN 'https' ELSE 'http' END AS scheme,
            CASE WHEN doc_id % 5 = 0 THEN ':8080'
                 WHEN doc_id % 3 = 0 THEN
                   CASE WHEN doc_id % 2 = 1 THEN ':443' ELSE ':80' END
                 ELSE '' END AS rawport,
            CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END AS canonport
          FROM documents)
        SELECT doc_id,
          scheme || '://WWW.Docs.' || source || '.COM' || rawport
            || '/a/' || CAST(doc_id % 7 AS VARCHAR) || '/./x/../p%7E'
            || CAST(doc_id AS VARCHAR) || '.html?utm_source=feed&z='
            || CAST(doc_id % 3 AS VARCHAR) || '&a=1&gclid=g'
            || CAST(doc_id AS VARCHAR) || '#sec' || CAST(doc_id AS VARCHAR)
            AS url,
          scheme || '://www.docs.' || lower(source) || '.com' || canonport
            || '/a/' || CAST(doc_id % 7 AS VARCHAR) || '/p~'
            || CAST(doc_id AS VARCHAR) || '.html?a=1&z='
            || CAST(doc_id % 3 AS VARCHAR) AS canon_url,
          'www.docs.' || lower(source) || '.com' AS host,
          lower(source) || '.com' AS domain
        FROM u
    """
    out["url_host_stats"] = """
        SELECT lower(source) || '.com' AS domain,
               CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1 ORDER BY domain
    """
    out["url_filter"] = """
        WITH d AS (SELECT DISTINCT lower(source) || '.com' AS domain
                   FROM documents),
             r AS (SELECT domain,
                          row_number() OVER (ORDER BY domain) AS rn FROM d)
        SELECT doc_id, r.domain
        FROM documents JOIN r ON lower(source) || '.com' = r.domain
        WHERE rn % 2 = 0 ORDER BY doc_id
    """
    return out
