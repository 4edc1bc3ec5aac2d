"""Edge-row parity gate (r6 verdict, What's missing #2).

The generated testdata carries no NULL texts/values/keys, no 1-token
documents, no timestamp-tied events and no blank fidelity cells — so the
r6 round's eight "parity-blind" edge fixes were exercised only by unit
tests, never by the engine-vs-DuckDB parity gate.  This module plants
exactly those edge rows into an augmented copy of the fixture tables and
re-runs the SAME parity comparison there, making the gate
regression-proof for the class of bug the r6 operator review found.

Edge rows planted (ids in the 90000000+ range so they never collide):
- documents: NULL text, empty-string text, a 1-token document
- events:   a (user, ts) tie pair with distinct event_ids; a NULL value
- lineitem: NULL l_quantity in a real group (count(value) divisors);
            NULL l_orderkey + NULL l_returnflag (NULL sampling key,
            blank fidelity cells) with qty >= 30 so the row SURVIVES the
            fidelity filter and its blank projections become visible
- orders:   NULL o_orderkey (the _hash_bucket NULL-key sentinel)
"""

from __future__ import annotations

import duckdb
import pytest

from spreadsheet_etl_engine_spark import registry
from spreadsheet_etl_engine_spark.sources.readers import TABLE_NAMES

from tests.conftest import SF_DIR
from tests.test_oracle_parity import assert_query_parity

# Every query whose r6/r7 edge fix is invisible at the plain fixture
# tables, plus the operators most sensitive to NULL/degenerate text.
EDGE_QUERIES = [
    "agg_moments",              # NULL l_quantity: count(value) divisor
    "events_value_outliers",    # NULL events.value: same divisor class
    "sample_hash",              # NULL o_orderkey: _hash_bucket sentinel
    "sample_stratified",        # NULL l_orderkey: NULL sampling key
    "dedup_simhash",            # NULL-text routing
    "dedup_simhash_pairs",      # NULL-text routing
    "events_sessionize",        # timestamp-tied events: event_id tiebreak
    "text_collocations_pmi",    # 1-token document guard
    "dsl_fidelity_strings",     # blank cells: NULL -> "" fill
    "train_pack_sequences",     # NULL-text doc: n_tok coalesce both sides
    "dedup_paragraphs",         # NULL/empty text: totality contract
    "dedup_incremental",        # unshingleable (NULL/short) doc routing
    # Broader NULL-robustness net: queries over the augmented tables
    # whose operators make NULL-sensitive decisions, run here so any
    # engine-vs-oracle divergence on planted edges surfaces as a test
    # failure instead of a future driver surprise.
    "dedup_exact",
    "dedup_keep_best",
    "text_quality_rank",
    "text_repetition",
    "text_contamination",
    "text_encoding_quality",
    "text_tfidf_top_terms",
    "curation_pipeline_decisions",
    "events_funnel",            # NULL-ts event: entry-filter parity
    "events_transitions",
    "mix_weights_by_source",
    # Mid-r7 edge-sweep finds, pinned here after their fixes: NULL-ts
    # rows belong to no time window (Spark window()/session_window drop
    # them; the oracles now filter), a NULL-text doc fingerprints NULL
    # (concat_ws silently emptied it), and a zero-variance / NULL-pair
    # regression group must yield NULL fits, not divide-by-zero.
    "events_tumbling_window",
    "events_sliding_window",
    "streaming_tumbling_counts",
    "streaming_session_counts",
    "text_fingerprint",
    "agg_linear_fit",
    # r9 family-7 find, pinned after its fix: DuckDB executes products
    # of two <=18-width decimals in int64 and overflows at runtime on
    # ~1e14 operands (the engine's Spark side widens automatically) —
    # the oracles now cast product operands to DECIMAL(19,2).
    "agg_corr_covar",
    # r9 family-8 find, pinned after its fix: DuckDB's wide-decimal ->
    # DOUBLE cast is up to 2 ULP off once |cents| > 2^53 (Spark's is
    # correctly rounded); the rolling-window oracle routes its final
    # cast through VARCHAR.  Only visible when a window frame slices
    # the cancel pair apart — group-level sums cancel first.
    "events_rolling_window",
    # r9 family-9 find, pinned after its fix: Spark's ANSI decimal cast
    # silently NULLs NaN/±Infinity (it only throws on finite overflow),
    # so the planted non-finite embedding components vanished from the
    # engine's centroid sums while DuckDB failed loud — the engine now
    # fails loud too (finite_or_fail), and this query's edge run pins
    # BOTH engines raising (see NONFINITE_DECIMAL_CONTRACT).
    "embedding_cluster_stats",
    # r9c: the diagnostic companion — pure counting, no decimal casts,
    # so on the same planted NaN/±inf rows it must VALUE-match the
    # oracle (and is the query an operator would run after the raise).
    "quality_nonfinite_report",
    # r10 family 11 (Unicode/bidi + hostile serialization): the four
    # round-trip queries the family's planted supplier/nation/customer
    # rows target — XML-special + RTL + combining + astral names through
    # the OOXML codec, RFC4180 CSV, and JSON escaping.
    "dsl_xlsx_roundtrip",
    "dsl_workbook_job",
    "dsl_csv_roundtrip",
    "dsl_json_source",
    # r10 family 12 (heavy duplication): the 12-copy identical cluster +
    # near-dup chain target the cluster/pairs surface — the
    # signature-collapse path (star edges + rep pairs vs the recursive-
    # CTE oracle), the banded pairs queries whose buckets now hold a
    # 12-row clique, and the df-threshold ops the cluster spikes.
    "dedup_components",
    "dedup_minhash_lsh_pairs",
    "agg_heavy_hitters",
    # r11 family 13 (signed zero / subnormals): the queries whose keys
    # or outputs the planted rows target — the -0.0/+0.0 window-order
    # tie on customer 90000 (rank decided by the zero comparison), the
    # distinct/min-max profile over l_quantity now containing -0.0 AND
    # 5e-324, the quantile interpolation with the near-zero pair in the
    # 'O' mass, and the running decimal sum over the signed-zero pair.
    "window_rank_orders",
    "window_running_sum",
    "profile_columns",
    "agg_quantiles",
    "sort_topk",
]

# Queries whose exact-decimal accumulation the planted NON-FINITE
# embedding components (vec_ids 90000005/90000006) push out of domain:
# the contract on both sides is FAIL LOUD (engine: finite_or_fail ->
# USER_RAISED_EXCEPTION; DuckDB: ConversionException on the non-finite
# -> DECIMAL cast), so their edge run asserts matching failure behavior
# instead of comparing results.  Pure-double embedding queries (cosine
# top-k, LSH pairs) stay in the value-parity sweep: IEEE NaN/inf
# arithmetic and NaN-above-inf ordering agree between the engines.
NONFINITE_DECIMAL_CONTRACT = {"embedding_cluster_stats"}

_AUGMENT = {
    "documents": """
        SELECT 90000001::BIGINT AS doc_id, NULL::VARCHAR AS text,
               'en' AS lang, 'edge' AS source, 0::BIGINT AS n_chars
        UNION ALL
        SELECT 90000002, '', 'en', 'edge', 0
        UNION ALL
        SELECT 90000003, 'solitaryword', 'en', 'edge', 12
        -- second family (r7 sweep, all clean first try — pinned so they
        -- stay that way): unicode/multibyte, consecutive spaces (empty
        -- tokens from a single-space split), a 2000-word doc
        UNION ALL
        SELECT 90000004, 'héllo wörld 🙂 héllo straße 中文 中文',
               'de', 'edge', 40
        UNION ALL
        SELECT 90000005, 'a  b   c a  b', 'en', 'edge', 13
        UNION ALL
        SELECT 90000006, repeat('longword ', 2000) || 'tail', 'en',
               'edge', 18004
        -- third family (r8): whitespace-only text (every token empty
        -- under a single-space split), and an exact-duplicate row PAIR
        -- (same doc_id, same text, planted twice) — the paragraph_dedup
        -- unique-id contract edge.  The twins are byte-identical so
        -- every deterministic computation (and any tiebreak) yields
        -- identical values in engine and oracle; what the family tests
        -- is that no operator crashes or diverges when the corpus PK
        -- assumption is violated.
        UNION ALL
        SELECT 90000007, '   ', 'en', 'edge', 3
        UNION ALL
        SELECT 90000008, 'duplicate twin row body', 'en', 'edge', 23
        UNION ALL
        SELECT 90000008, 'duplicate twin row body', 'en', 'edge', 23
        -- fifth family (r8b): empty-string categorical keys (lang and
        -- source '' — group keys that are blank but NOT NULL) and a
        -- near-max bigint id (id arithmetic: negation tricks, salts,
        -- modulo routing must not overflow).
        UNION ALL
        SELECT 90000009, 'empty key family text body words', '', '', 32
        UNION ALL
        SELECT 9223372036854775806, 'near max bigint id document', 'en',
               'edge', 27
        -- eighth family (r9b): byte-identical text under DISTINCT ids
        -- (family 3's twins share an id; this pair does not) — exact
        -- dedup must keep the min id, every pair operator must emit the
        -- pair once with a deterministic (a,b) orientation, and
        -- jaccard/cosine similarities of 1.0 sit exactly ON the >=
        -- threshold boundary.
        UNION ALL
        SELECT 90000012, 'distinct id byte identical twin text', 'en',
               'edge', 36
        UNION ALL
        SELECT 90000013, 'distinct id byte identical twin text', 'en',
               'edge', 36
        -- eighth family addendum (r9 review): a VERTICAL-TAB document —
        -- Java's \\s includes \\x0B, RE2's does not, so any \\s-negating
        -- pattern diverges between engine and oracle on this row (the
        -- text patterns now spell the whitespace class out explicitly;
        -- this row keeps them honest).
        UNION ALL
        SELECT 90000014, 'vertical' || chr(11) || 'tab, probe!', 'en',
               'edge', 20
        -- ninth family (r9c): astral-plane unicode.  (a) 4-byte code
        -- points in TEXT — a ZWJ emoji family (7 code points incl.
        -- zero-width joiners) and mathematical-alphanumeric letters:
        -- length/substring/regex/tokenize must count code points
        -- identically through Spark's UTF8String and DuckDB's UTF-8
        -- (Java regex sees surrogate PAIRS, RE2 sees code points — any
        -- '.'-counting divergence surfaces here).  (b) combining marks:
        -- a decomposed e+U+0301 vs precomposed é pair — byte-distinct,
        -- so exact dedup/fingerprints must keep them apart in BOTH
        -- engines.  (c) an astral-plane GROUP KEY (lang/source) — group
        -- hashing and sorting on 4-byte UTF-8 keys (binary collation
        -- both sides).
        UNION ALL
        SELECT 90000015, 'family ' || chr(128105) || chr(8205) ||
               chr(128105) || chr(8205) || chr(128103) || chr(8205) ||
               chr(128102) || ' emoji and math ' || chr(120088) ||
               chr(120107) || chr(120102) || ' tail', 'en', 'edge', 30
        UNION ALL
        SELECT 90000016, 'cafe' || chr(769) || ' combining mark probe',
               'fr', 'edge', 26
        UNION ALL
        SELECT 90000017, 'café combining mark probe', 'fr', 'edge', 25
        UNION ALL
        SELECT 90000018, 'astral key doc body words', chr(127760),
               chr(119982) || 'rc', 25
        -- tenth family (r9d): a 20k-char SINGLE token (tokenizers,
        -- shingles, the BPE-ish regex and length stats all meet one
        -- unsplittable monster) and invisible-character text (BOM
        -- U+FEFF mid-string + zero-width space U+200B — characters
        -- that look like boundaries but are NOT \s in either regex
        -- dialect).
        UNION ALL
        SELECT 90000019, repeat('x', 20000), 'en', 'edge', 20000
        UNION ALL
        SELECT 90000020, 'bom' || chr(65279) || 'mid zwsp' ||
               chr(8203) || 'end', 'en', 'edge', 17
        -- eleventh family (r10): bidirectional text.  (a) RTL Arabic
        -- with an embedded RLM (U+200F) and an RLO..PDF override span
        -- (U+202E/U+202C) — bidi controls are invisible, are NOT
        -- whitespace in either regex dialect, and must ride
        -- tokenization/shingling/fingerprints as ordinary codepoints;
        -- (b) NBSP (U+00A0) + LINE SEPARATOR (U+2028): look like
        -- boundaries, are not ' ' and not ASCII \\s — single-space
        -- tokenization must keep them glued inside tokens in both
        -- engines.  (Case-divergent codepoints — ß, İ, Σ, ligatures —
        -- are deliberately ABSENT from every column that feeds an
        -- upper()/lower() path: Java full case mapping and DuckDB's
        -- utf8proc simple mapping genuinely differ there; the
        -- divergence is pinned per-codepoint by
        -- test_case_mapping_divergence_pinned below instead.)
        UNION ALL
        SELECT 90000021, 'النص' || chr(8207) || ' العربي ' || chr(8238) ||
               'reversed' || chr(8236) || ' تجربة كلمات مكررة تجربة',
               'ar', 'edge', 44
        UNION ALL
        SELECT 90000022, 'nbsp' || chr(160) || 'glue linesep' ||
               chr(8232) || 'glue tail words here', 'en', 'edge', 30
        -- twelfth family (r10): HEAVY DUPLICATION.  (a) a 12-copy
        -- byte-identical boilerplate cluster under DISTINCT ids —
        -- family 8's pair at cluster scale: the signature-collapse
        -- path's target workload (11 star edges, one representative;
        -- C(12,2)=66 pairs in every pairs query), survivorship picking
        -- ONE winner of 12 in the curation pipeline, and a 12x df
        -- spike through tfidf/ngram/heavy-hitters; (b) a near-dup
        -- CHAIN (three docs, each one word from the next) so clusters
        -- can also form through REPRESENTATIVE pairs — multi-hop
        -- components, not only star edges.  Whether a chain hop
        -- collides is set by the fixed MinHash banding (deterministic
        -- on both engines), so parity holds for either outcome.
        UNION ALL
        SELECT 90000030 + i,
               'duplicate cluster boilerplate terms of service apply ' ||
               'to every mirror page', 'en', 'edge', 73
        FROM range(12) t(i)
        UNION ALL
        SELECT 90000042, 'chain alpha beta gamma delta epsilon zeta ' ||
               'eta theta iota', 'en', 'edge', 56
        UNION ALL
        SELECT 90000043, 'chain alpha beta gamma delta epsilon zeta ' ||
               'eta theta swapped', 'en', 'edge', 59
        UNION ALL
        SELECT 90000044, 'start alpha beta gamma delta epsilon zeta ' ||
               'eta theta swapped', 'en', 'edge', 59
    """,
    "events": """
        SELECT 90000001::BIGINT AS event_id,
               TIMESTAMP '2025-01-01 00:00:00' AS ts,
               7::BIGINT AS user_id, 'view' AS event_type,
               NULL::DOUBLE AS value, NULL::VARCHAR AS props
        UNION ALL
        SELECT 90000002, TIMESTAMP '2025-01-01 00:00:00', 7, 'view',
               1.5, NULL
        UNION ALL
        SELECT 90000003, NULL, 7, 'purchase', 2.5, NULL
        UNION ALL
        SELECT 90000004, TIMESTAMP '2025-01-01 00:05:00', 7, 'view',
               -1234.56, '{"x": 1}'
        -- third family (r8): an epoch-boundary timestamp (unix second
        -- 0 — window/session/watermark/decay arithmetic at the origin)
        -- and an exactly-zero value (outlier z-score and decay paths
        -- where 0 is neither positive nor negative).
        UNION ALL
        SELECT 90000005, TIMESTAMP '1970-01-01 00:00:00', 7, 'view',
               3.0, NULL
        UNION ALL
        SELECT 90000006, TIMESTAMP '2025-01-01 00:06:00', 7, 'click',
               0.0, NULL
        -- fifth family (r8b): a far-future timestamp (decay/window/
        -- sessionization arithmetic at extreme event-time distance; the
        -- max-ts anchor for decay jumps ~8000 years), an empty-string
        -- event_type (blank-but-not-NULL funnel/transition key), and a
        -- 1e12 value — the LARGEST magnitude class inside the engine's
        -- deterministic-sum domain (sums cast to DECIMAL(18,2); beyond
        -- ~1e16 the contract is fail-loud under ANSI, pinned by
        -- test_decimal_sum_domain_fails_loud, so the sweep plants the
        -- in-domain extreme).
        UNION ALL
        SELECT 90000007, TIMESTAMP '9999-12-31 23:59:59', 8, 'view',
               4.5, NULL
        UNION ALL
        SELECT 90000008, TIMESTAMP '2025-01-01 00:07:00', 7, '',
               1.0, NULL
        UNION ALL
        SELECT 90000009, TIMESTAMP '2025-01-01 00:08:00', 7, 'view',
               1e12, NULL
        -- seventh family (r9): a decimal-boundary CANCEL PAIR.  The
        -- literals are 16 significant digits, which a DOUBLE column
        -- cannot hold (ulp at 1e14 is 0.015625): they store as exactly
        -- 1e14 and -99999999999999.984375, whose DECIMAL(18,2) casts
        -- are +100000000000000.00 / -99999999999999.98.  The decimal
        -- pair sum is therefore exactly 0.02 while the float64 sum of
        -- the stored doubles is exactly 0.015625 — distinct values, so
        -- the probe separates the engine's documented exact-decimal-sum
        -- convention from a silent float64 lookalike (numbers verified
        -- empirically in the r9 review; an earlier comment claimed an
        -- impossible 0.01-apart pair).
        UNION ALL
        SELECT 90000010, TIMESTAMP '2025-01-01 00:09:00', 7, 'view',
               99999999999999.99, NULL
        UNION ALL
        SELECT 90000011, TIMESTAMP '2025-01-01 00:09:30', 7, 'view',
               -99999999999999.98, NULL
        -- eighth family (r9b): BOUNDARY-semantics rows.  An event
        -- exactly ON a 10-minute window edge (half-open [start,end)
        -- must route it to the NEXT window in both engines), the last
        -- representable microsecond BEFORE that edge (also exercises
        -- sub-second precision through the ns->us scan path), and — on
        -- a FRESH user with exactly two events so no other row can
        -- extend the session (r9 review find: planted under user 7 the
        -- probe was inert) — a pair exactly gap=30min apart, the
        -- sessionize boundary: Spark's session_window ends at
        -- last_ts + gap EXCLUSIVE, so the second event opens a NEW
        -- session, and the oracle's lag comparison must use >= gap to
        -- agree.
        UNION ALL
        SELECT 90000012, TIMESTAMP '2025-01-01 00:10:00', 7, 'view',
               2.0, NULL
        UNION ALL
        SELECT 90000013, TIMESTAMP '2025-01-01 00:19:59.999999', 7,
               'click', 3.0, NULL
        UNION ALL
        SELECT 90000014, TIMESTAMP '2025-01-01 02:00:00', 90000, 'view',
               1.0, NULL
        UNION ALL
        SELECT 90000015, TIMESTAMP '2025-01-01 02:30:00', 90000, 'view',
               1.0, NULL
        -- ninth family (r9c): a 4-byte-unicode event_type — funnel/
        -- transition/group keys hash and sort on raw UTF-8 bytes in
        -- both engines; an astral key must group with itself and never
        -- merge with its BMP lookalikes.
        UNION ALL
        SELECT 90000016, TIMESTAMP '2025-01-01 00:11:00', 7,
               chr(128722) || 'cart', 1.0, NULL
        -- tenth family (r9d): NEGATIVE ZERO — IEEE -0.0 equals 0.0 and
        -- must group/sum/sort with it identically in both engines (a
        -- decimal cast erases the sign; float paths must not let the
        -- sign leak into comparisons).
        UNION ALL
        SELECT 90000017, TIMESTAMP '2025-01-01 00:12:00', 7, 'view',
               -0.0, NULL
        -- eleventh family (r10): a decomposed/precomposed combining-mark
        -- event_type PAIR ('e'+U+0301 vs 'é') — byte-distinct keys that
        -- render identically; grouping, funnel/transition keys and
        -- sorts must keep them apart in both engines (binary collation;
        -- neither engine normalizes).
        UNION ALL
        SELECT 90000018, TIMESTAMP '2025-01-01 00:13:00', 7,
               'e' || chr(769) || 'vent', 1.0, NULL
        UNION ALL
        SELECT 90000019, TIMESTAMP '2025-01-01 00:14:00', 7,
               'évent', 1.0, NULL
        -- thirteenth family (r11): a SUBNORMAL value (5e-324) — rides
        -- the z-score float arithmetic (identical IEEE ops both
        -- engines), the decimal measure contract (0.00), and the
        -- stateful streaming cents cast (0 cents).  NaN-as-measure is
        -- deliberately NOT planted here: every events.value consumer
        -- sums under the decimal(18,2) contract whose NaN behavior is
        -- already pinned fail-loud by family 9's
        -- NONFINITE_DECIMAL_CONTRACT — a planted NaN would just flip
        -- every green row into that contract, probing nothing new
        -- (NaN equality/ordering as a VALUE is probed on the pure-
        -- double embedding paths, family 9).
        UNION ALL
        SELECT 90000020, TIMESTAMP '2025-01-01 00:15:00', 7, 'view',
               5e-324, NULL
    """,
    "lineitem": """
        SELECT 90000001::BIGINT AS l_orderkey, 1::BIGINT AS l_partkey,
               1::BIGINT AS l_suppkey, 1::INTEGER AS l_linenumber,
               NULL::DOUBLE AS l_quantity, 100.0::DOUBLE AS l_extendedprice,
               0.0::DOUBLE AS l_discount, 0.0::DOUBLE AS l_tax,
               'A' AS l_returnflag, 'F' AS l_linestatus,
               TIMESTAMP '2025-01-01 00:00:00' AS l_shipdate
        UNION ALL
        SELECT NULL, 1, 1, 9991, 45.0, 100.0, 0.0, 0.0,
               NULL, 'F', TIMESTAMP '2025-01-01 00:00:00'
        UNION ALL
        SELECT 90000002, 1, 1, 1, -5.25, -10.5, 0.0, 0.0,
               'A', 'F', TIMESTAMP '2025-01-01 00:00:00'
        -- third family (r8): exactly-zero measures (zero contributes to
        -- counts/divisors but not sums) at an epoch-boundary ship date.
        UNION ALL
        SELECT 90000003, 1, 1, 1, 0.0, 0.0, 0.0, 0.0,
               'A', 'F', TIMESTAMP '1970-01-01 00:00:00'
        -- sixth family (r8c): NEGATIVE-epoch date arithmetic (pre-1970
        -- ship date; the truncate-vs-floor divergence class the cohort
        -- fix was in).  Planted in lineitem only: an events-side probe
        -- found every batch query clean but the real-stream queries
        -- nondeterministically DROP a >watermark-late row depending on
        -- which micro-batch the file lands in — by-design streaming
        -- semantics already pinned deterministically by
        -- test_watermark_drops_late_data_and_append_holds_open_windows.
        UNION ALL
        SELECT 91000001, 1, 1, 1, 5.0, 10.0, 0.0, 0.0,
               'A', 'F', TIMESTAMP '1920-05-05 03:07:11'
        -- seventh family (r9): (a) the price-side decimal cancel pair
        -- (see events family 7 for the stored-double arithmetic — same
        -- probe on the lineitem pricing aggregation paths; quantities
        -- stay small so the moment/
        -- z-score domain is untouched); (b) EMPTY-STRING group/fidelity
        -- keys ('' l_returnflag/l_linestatus — blank but NOT NULL,
        -- qty >= 30 so the row survives the fidelity filter: the
        -- reference's DIRECT projection falls back to the LITERAL on a
        -- missing header (main.gs:110-111), and '' must stay distinct
        -- from NULL through grouping, fidelity fill and projection).
        UNION ALL
        SELECT 91000002, 1, 1, 1, 5.0, 99999999999999.99, 0.0, 0.0,
               'A', 'F', TIMESTAMP '2025-01-02 00:00:00'
        UNION ALL
        SELECT 91000003, 1, 1, 1, 5.0, -99999999999999.98, 0.0, 0.0,
               'A', 'F', TIMESTAMP '2025-01-02 00:00:00'
        UNION ALL
        SELECT 91000004, 1, 1, 1, 35.0, 100.0, 0.0, 0.0,
               '', '', TIMESTAMP '2025-01-02 00:00:00'
        -- ninth family (r9c): the REVERSE half-NULL regression pair —
        -- family 1 plants (x NULL, y present); this row is (x present,
        -- y NULL).  Pairwise-complete semantics (COVAR_POP/regr_count)
        -- must drop BOTH directions from every power sum and the
        -- divisor, while count/avg of the single present column still
        -- see the row.
        UNION ALL
        SELECT 91000005, 1, 1, 1, 7.0, NULL, 0.0, 0.0,
               'A', 'F', TIMESTAMP '2025-01-02 00:00:00'
        -- thirteenth family (r11): SIGNED ZERO and SUBNORMALS.
        -- (a) l_quantity = -0.0 alongside family 3's +0.0: both engines
        -- normalize the pair in DISTINCT (1) and grouping (+0.0 key) —
        -- verified empirically — so n_distinct/count paths must agree;
        -- the decimal cast erases the sign (0.00 both).  The planted
        -- row keeps -0.0 AWAY from any min/max OUTPUT extremum
        -- (l_quantity's fixture min is -5.25): Spark's min AND max over
        -- {-0.0, 0.0} return -0.0 while DuckDB returns +0.0 — equal
        -- under IEEE compare (local parity is blind to it) but distinct
        -- under any byte/string value hash, so a -0.0 extremum is a
        -- locally-green, driver-red trap; the family comment IS the
        -- guard (see test_negative_zero_minmax_sign_divergence).
        -- (b) a SUBNORMAL quantity (5e-324, the smallest positive
        -- double): distinct from zero in both engines, 0.00 under the
        -- decimal measure contract, and exercises quantile/moment
        -- arithmetic at the bottom of the exponent range.
        UNION ALL
        SELECT 91000006, 1, 1, 1, -0.0, 100.0, 0.0, 0.0,
               'A', 'F', TIMESTAMP '2025-01-03 00:00:00'
        UNION ALL
        SELECT 91000007, 1, 1, 1, 5e-324, 100.0, 0.0, 0.0,
               'A', 'F', TIMESTAMP '2025-01-03 00:00:00'
    """,
    "orders": """
        SELECT NULL::BIGINT AS o_orderkey, 1::BIGINT AS o_custkey,
               'O' AS o_orderstatus, 123.45::DOUBLE AS o_totalprice,
               TIMESTAMP '2025-01-01 00:00:00' AS o_orderdate,
               '1-URGENT' AS o_orderpriority
        -- eighth family (r9b): an isolated 4-row group (new status 'Z')
        -- whose p50/p90 both land BETWEEN samples with tied values —
        -- the continuous-quantile interpolation boundary (Spark
        -- percentile vs DuckDB quantile_cont must interpolate
        -- identically, including across the duplicate mass).
        UNION ALL
        SELECT 90000001, 1, 'Z', 10.0,
               TIMESTAMP '2025-01-02 00:00:00', '1-URGENT'
        UNION ALL
        SELECT 90000002, 1, 'Z', 10.0,
               TIMESTAMP '2025-01-03 00:00:00', '1-URGENT'
        UNION ALL
        SELECT 90000003, 1, 'Z', 20.0,
               TIMESTAMP '2025-01-04 00:00:00', '1-URGENT'
        UNION ALL
        SELECT 90000004, 1, 'Z', 20.0,
               TIMESTAMP '2025-01-05 00:00:00', '1-URGENT'
        -- thirteenth family (r11): a -0.0/+0.0 WINDOW-ORDER-KEY tie on
        -- a FRESH customer (90000: these two are its only orders, so
        -- both rows land in window_rank_orders' rnk<=3 output and the
        -- rank assignment is decided BY the signed-zero comparison).
        -- Row 13 carries -0.0 and the SMALLER orderkey: engines that
        -- treat the zeros as equal under ORDER BY ... DESC fall through
        -- to the orderkey tiebreak (13 -> rnk 1); an engine ordering
        -- -0.0 strictly below +0.0 would rank 14 first — verified
        -- empirically that Spark and DuckDB both normalize, so this
        -- pins the agreement.  Prices ~0 sit at the bottom of every
        -- top-k, so sort_topk membership is untouched; the decimal
        -- cast in window_running_sum erases the sign (0.00).
        UNION ALL
        SELECT 90000013, 90000, 'O', -0.0,
               TIMESTAMP '2025-01-06 00:00:00', '1-URGENT'
        UNION ALL
        SELECT 90000014, 90000, 'O', 0.0,
               TIMESTAMP '2025-01-07 00:00:00', '1-URGENT'
    """,
    # fourth family (r8): the previously-unaugmented tables.  A customer
    # with every nullable attribute NULL (NULL join key -> dim-join miss,
    # NULL group key, NULL measure) and two embedding edges: the all-zero
    # vector (cosine's divide-by-zero axis) and a NULL embedding (vector
    # ops' totality contract).
    "customer": """
        SELECT 90000001::BIGINT AS c_custkey, 'edge-null-cust' AS c_name,
               NULL::INTEGER AS c_nationkey, NULL::DOUBLE AS c_acctbal,
               NULL::VARCHAR AS c_mktsegment
        -- tenth family (r9d): JSON-hostile names with positive balances
        -- so they ride dsl_json_source's write->read->filter round trip
        -- (escapes: quote, backslash, newline, tab — JSON must escape
        -- all four losslessly).
        UNION ALL
        SELECT 90000002, 'json "q" back\\slash', 1, 500.0, 'BUILDING'
        UNION ALL
        SELECT 90000003, 'json line1' || chr(10) || 'line2' || chr(9) ||
               'tab', 1, 500.0, 'BUILDING'
        -- eleventh family (r10): an RTL name with an embedded RLM and a
        -- quote — JSON escaping of multibyte + escape-needing chars in
        -- one value; rides dsl_json_source's write->read->filter round
        -- trip.  (Arabic is UNCASED, so the etl_upsert upper() path is
        -- an identity on it in both engines — cased Greek/Turkish/ß
        -- names would hit the pinned case-mapping divergence and are
        -- deliberately not planted here.)
        UNION ALL
        SELECT 90000004, 'عميل' || chr(8207) || ' "اقتباس"', 1, 500.0,
               'BUILDING'
    """,
    # tenth family (r9d): CSV-hostile nation names — dsl_csv_roundtrip
    # writes nation to headered CSV and reads it back in fidelity mode,
    # so embedded separators/quotes/newlines/CRLF/padding ride the full
    # RFC4180 write->read path under the sweep (the oracle recomputes
    # from parquet, so any CSV mangling breaks parity).  regionkey 2
    # keeps every row past the query's parseFloat filter.
    "nation": """
        SELECT 900001::INTEGER AS n_nationkey, 'comma, inc' AS n_name,
               2::INTEGER AS n_regionkey
        UNION ALL
        SELECT 900002, 'quote "hi" end', 2
        UNION ALL
        SELECT 900003, 'line1' || chr(10) || 'line2', 2
        UNION ALL
        SELECT 900004, 'crlf' || chr(13) || chr(10) || 'end', 2
        UNION ALL
        SELECT 900005, '  padded  ', 2
        UNION ALL
        SELECT 900006, 'tab' || chr(9) || 'here', 2
        -- eleventh family (r10): multibyte through the RFC4180 path —
        -- a decomposed combining-mark name (byte-distinct from its
        -- precomposed twin below; CSV must round-trip the raw bytes,
        -- not a normalization) and an RTL name with an embedded RLM.
        UNION ALL
        SELECT 900007, 'cafe' || chr(769) || ' nation', 2
        UNION ALL
        SELECT 900008, 'café nation', 2
        UNION ALL
        SELECT 900009, 'دولة' || chr(8207) || ' عربية', 2
    """,
    # eleventh family (r10): the first SUPPLIER augmentation — names
    # chosen to ride the xlsx write->read round trip (dsl_xlsx_roundtrip
    # writes them to a real workbook and hashes the read-back;
    # dsl_workbook_job routes them through TWO write->read trips):
    # XML-special characters (escape/unescape), the CDATA terminator, a
    # formula-leading name (round-trips via the <f> cell by design —
    # spreadsheet semantics), xml:space whitespace preservation, an OOXML
    # escape-literal ('_x000D_' stays the literal 7 characters: the
    # inlineStr codec neither emits nor decodes _xHHHH_ sequences — an
    # interop caveat vs shared-strings readers, pinned honest here), RTL
    # Arabic with an embedded RLM, a decomposed/precomposed combining
    # pair (byte-distinct, must stay distinct through the workbook), and
    # astral-plane letters.  s_acctbal 2000 > both queries' filters
    # (1000 / 0) so every row surfaces in both outputs; distinct
    # suppkeys, valid nationkey.
    "supplier": """
        SELECT 90000001::BIGINT AS s_suppkey,
               'xml <angle> & "quote" probe' AS s_name,
               1::INTEGER AS s_nationkey, 2000.0::DOUBLE AS s_acctbal
        UNION ALL SELECT 90000002, 'cdata ]]> terminator', 1, 2000.0
        UNION ALL SELECT 90000003, '=SUM(A1:A2)', 1, 2000.0
        UNION ALL SELECT 90000004, '  padded name  ', 1, 2000.0
        UNION ALL SELECT 90000005, 'tab' || chr(9) || 'in name', 1, 2000.0
        UNION ALL SELECT 90000006, '_x000D_ literal', 1, 2000.0
        UNION ALL SELECT 90000007, 'شركة' || chr(8207) || ' التوريد', 1,
                  2000.0
        UNION ALL SELECT 90000008, 'suppe' || chr(769) || ' acute', 1,
                  2000.0
        UNION ALL SELECT 90000009, 'suppé acute', 1, 2000.0
        UNION ALL SELECT 90000010, chr(119982) || 'upply ' || chr(127744)
                  || ' co', 1, 2000.0
    """,
    "embeddings": """
        SELECT 90000001::BIGINT AS vec_id,
               list_transform(range(64), i -> 0.0::FLOAT) AS embedding,
               0::INTEGER AS label
        UNION ALL
        SELECT 90000002, NULL, NULL
        -- eighth family (r9b): a byte-identical vector PAIR under
        -- distinct ids — their cosines against any query are equal to
        -- the bit, so any top-k boundary they straddle exercises the
        -- deterministic neighbor-id tiebreak in engine and oracle.
        UNION ALL
        SELECT 90000003,
               list_transform(range(64), i -> (0.25 + i/100.0)::FLOAT), 1
        UNION ALL
        SELECT 90000004,
               list_transform(range(64), i -> (0.25 + i/100.0)::FLOAT), 1
        -- ninth family (r9c): non-finite components.  A NaN component
        -- poisons every dot product and norm to NaN; an ±Infinity pair
        -- yields inf/NaN arithmetic (inf * 0 = NaN) — both engines run
        -- IEEE-754 doubles and BOTH order NaN above +inf, so cosines,
        -- top-k ranks and >= threshold filters must agree to the row.
        -- (The parity comparator cannot tell a float NULL from NaN —
        -- pandas maps both to NaN — so what these rows pin is crash-
        -- freedom, row counts, and the integer rank/pair columns that
        -- any NaN-ordering divergence would shift.)
        UNION ALL
        SELECT 90000005,
               list_transform(range(64),
                              i -> CASE WHEN i = 0 THEN 'NaN'::FLOAT
                                        ELSE 0.1::FLOAT END), 2
        UNION ALL
        SELECT 90000006,
               list_transform(range(64),
                              i -> CASE WHEN i = 1 THEN 'Infinity'::FLOAT
                                        WHEN i = 2 THEN '-Infinity'::FLOAT
                                        ELSE 0.2::FLOAT END), 2
        -- tenth family (r9d): a vector of NEGATIVE ZEROS — dot products
        -- and norms are -0.0/0.0, and the zero-norm cosine contract
        -- (maps to 0.0) must not be dodged by the sign bit.
        UNION ALL
        SELECT 90000007,
               list_transform(range(64), i -> (-0.0)::FLOAT), 0
    """,
}


# Queries whose declared contract the duplicate-id twins VIOLATE:
# paragraph_dedup requires a unique corpus PK (validate_ids=True raises
# on the twins; the silent no-validate divergence is pinned in
# test_paragraph_dedup_validate_ids_fails_loud_on_duplicates), and
# minhash_signature emits one signature row per INPUT ROW (per-row
# zero-shuffle compute, plan-asserted) where the oracle's GROUP BY
# doc_id collapses the twins to one.  Running engine-vs-oracle parity on
# contract-violating input would compare two undefined behaviors, so
# these queries sweep against the same augmented tables MINUS the twin
# row (every other edge row intact).
UNIQUE_ID_CONTRACT = {"dedup_paragraphs", "dedup_minhash_signature"}


def _build_edge_tables(out: str, *, drop_twins: bool) -> None:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        extra = _AUGMENT.get(t)
        if extra:
            sel = f"SELECT * FROM '{src}' UNION ALL BY NAME ({extra})"
            if drop_twins and t == "documents":
                sel = (f"SELECT * FROM ({sel}) QUALIFY "
                       "row_number() OVER (PARTITION BY doc_id) = 1")
            con.execute(f"COPY ({sel}) TO '{dst}' (FORMAT PARQUET)")
        else:
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
    con.close()


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    """Augmented copy of the fixture tables: base rows + edge rows, same
    schemas (UNION ALL BY NAME types unify against the base parquet)."""
    out = tmp_path_factory.mktemp("edge_sf")
    _build_edge_tables(str(out), drop_twins=False)
    return str(out)


@pytest.fixture(scope="module")
def edge_dir_unique(tmp_path_factory) -> str:
    """Same augmented tables with the duplicate-id twin collapsed to one
    row — the variant UNIQUE_ID_CONTRACT queries sweep against."""
    out = tmp_path_factory.mktemp("edge_sf_unique")
    _build_edge_tables(str(out), drop_twins=True)
    return str(out)


def _duck_for(path: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = _duck_for(edge_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def edge_duck_unique(edge_dir_unique):
    con = _duck_for(edge_dir_unique)
    yield con
    con.close()


def test_edge_rows_present(edge_dir, edge_duck):
    n = edge_duck.execute(
        "SELECT count(*) FROM documents WHERE doc_id >= 90000000"
    ).fetchone()[0]
    assert n == 37  # 22 through family 11 + family 12's 12-copy cluster and 3-doc chain
    sup = edge_duck.execute(
        "SELECT count(*) FROM supplier WHERE s_suppkey >= 90000000"
    ).fetchone()[0]
    assert sup == 10
    tie = edge_duck.execute(
        "SELECT count(*) FROM events WHERE user_id = 7 "
        "AND ts = TIMESTAMP '2025-01-01 00:00:00'"
    ).fetchone()[0]
    assert tie == 2
    twins = edge_duck.execute(
        "SELECT count(*) FROM documents WHERE doc_id = 90000008"
    ).fetchone()[0]
    assert twins == 2
    null_cust = edge_duck.execute(
        "SELECT count(*) FROM customer WHERE c_nationkey IS NULL"
    ).fetchone()[0]
    assert null_cust == 1
    vec_edges = edge_duck.execute(
        "SELECT count(*) FILTER (embedding IS NULL), "
        "count(*) FILTER (len(list_filter(embedding, x -> x != 0)) = 0) "
        "FROM embeddings WHERE vec_id >= 90000000"
    ).fetchone()
    # two zero-norm vectors since family 10: all-+0.0 and all--0.0
    assert vec_edges == (1, 2)


# r10 family 11 companion: upper()/lower() on cased non-ASCII genuinely
# DIVERGE between the engines — Spark runs Java's full (length-changing,
# context-sensitive) case mapping, DuckDB runs utf8proc's simple
# codepoint-wise mapping.  Neither is wrong; they implement different
# Unicode case operations.  The engine's semantics is Spark's (the
# built-in upper/lower IS the fast path; a UDF matching utf8proc would
# be backwards), so parity fixtures must not route these codepoints
# through an upper()/lower() query — this pin makes that contract, and
# both engines' exact behavior, fail loud if a Spark or DuckDB upgrade
# shifts either side.
CASEMAP_PROBES = [
    # (input, fn, spark_result, duckdb_result)
    ("straße", "upper", "STRASSE", "STRAẞE"),      # full ß->SS vs ẞ
    ("İstanbul", "lower", "i̇stanbul", "istanbul"),  # full i+dot
    ("ΣΟΦΟΣ", "lower", "σοφος", "σοφοσ"),          # final sigma
    ("ﬃ", "upper", "FFI", "ﬃ"),                    # ligature expansion
]


def test_case_mapping_divergence_pinned(spark):
    import duckdb as _dd

    con = _dd.connect()
    rows = spark.createDataFrame(
        [(s,) for s, _, _, _ in CASEMAP_PROBES], "s string"
    )
    from pyspark.sql import functions as SF

    got = {
        r["s"]: (r["u"], r["l"])
        for r in rows.select(
            "s", SF.upper("s").alias("u"), SF.lower("s").alias("l")
        ).collect()
    }
    for text, fn, spark_exp, duck_exp in CASEMAP_PROBES:
        spark_got = got[text][0 if fn == "upper" else 1]
        duck_got = con.execute(f"SELECT {fn}(?)", [text]).fetchone()[0]
        assert spark_got == spark_exp, (text, fn, spark_got)
        assert duck_got == duck_exp, (text, fn, duck_got)
        assert spark_got != duck_got  # the divergence itself, pinned
    con.close()


def test_negative_zero_minmax_sign_divergence(spark):
    """Family-13 guard (r11): over the value set {-0.0, +0.0}, the SIGN
    of min()/max() is FIRST-SEEN — scan-order-dependent — in BOTH
    engines (verified: DuckDB returns +0.0 with +0.0 listed first and
    -0.0 with -0.0 listed first; Spark likewise keeps the first zero
    its combiner meets).  The zeros compare equal under IEEE, so pandas
    parity and every comparison path are blind to the sign — but any
    BYTE or STRING value hash tells them apart, which makes a zero
    min/max whose input set contains -0.0 a locally-green, driver-red
    trap that not even a fixed oracle can pin (the engine side isn't
    deterministic across partitionings).  This test pins the DuckDB
    order-dependence so the planted family rows can rely on the rule
    they follow: keep -0.0 away from min/max OUTPUT extremums, or
    normalize with `+ 0.0` (maps -0.0 to +0.0, identity on every other
    double including NaN)."""
    import math

    import duckdb as _dd

    from pyspark.sql import functions as SF

    con = _dd.connect()
    mn_pos_first, _ = con.execute(
        "SELECT min(v), max(v) FROM (VALUES (0.0::DOUBLE),"
        "(-0.0::DOUBLE)) t(v)").fetchone()
    mn_neg_first, _ = con.execute(
        "SELECT min(v), max(v) FROM (VALUES (-0.0::DOUBLE),"
        "(0.0::DOUBLE)) t(v)").fetchone()
    con.close()
    assert math.copysign(1.0, mn_pos_first) == 1.0   # first-seen: +0.0
    assert math.copysign(1.0, mn_neg_first) == -1.0  # first-seen: -0.0
    # Spark returns A zero (sign unspecified — partition-order-
    # dependent), and the normalization identity holds.
    pair = spark.createDataFrame([(-0.0,), (0.0,)], "v double")
    got = pair.agg(SF.min("v").alias("mn"), SF.max("v").alias("mx")).collect()[0]
    assert got["mn"] == 0.0 and got["mx"] == 0.0
    assert math.copysign(1.0, -0.0 + 0.0) == 1.0


def test_decimal_cast_divergence_pinned(spark):
    """r11 mechanism pin (found while hardening the stateful 2^53
    probe).  Above ~2^53 cents the double->DECIMAL(18,2) conversions of
    the two engines use DIFFERENT algorithms, verified here value by
    value so the fixture-domain rules rest on tests:

    1. Spark casts via the double's SHORTEST REPR (BigDecimal.valueOf):
       the distinguishing double is ...410.09375, whose exact value
       rounds to .09 but whose shortest repr is '...410.1' — Spark
       yields .10.
    2. DuckDB rounds value*100 computed IN float64: for the double
       ...409.953125 that product's nearest float64 lands at cents
       ...996 while Spark's shortest repr gives .95 -> ...995 — the
       engines DIVERGE on the same input double.
    3. DuckDB's SQL *literal* path ('x.yz::DOUBLE') adds a third
       variation: the literal parses as DECIMAL and converts via int64
       cents -> float64, losing the odd bit (...409.93::DOUBLE is one
       ulp BELOW Python/parquet's float('...409.93')).  Oracles at
       these magnitudes must read the shared parquet, never inline
       VALUES literals.
    4. In the fixtures' domain (2-decimal values <= 1e12, family-5/7
       plants) all mechanisms agree — witnessed below.
    The int64-cents-through-float64 conversion is also the MECHANISM
    behind the family-8 finding (DuckDB wide-decimal -> DOUBLE up to
    2 ulp off past 2^53 cents; VARCHAR route is the documented fix)."""
    import duckdb as _dd

    from pyspark.sql import functions as SF

    def spark_cents(v: float) -> int:
        return (spark.range(1)
                .select((SF.lit(v).cast("decimal(18,2)") * 100)
                        .cast("long").alias("c")).collect()[0]["c"])

    con = _dd.connect()

    def duck_cents(v: float) -> int:
        return con.execute(
            "SELECT CAST(CAST(? AS DECIMAL(18,2)) * 100 AS BIGINT)",
            [v]).fetchone()[0]

    # fact 1: shortest repr beats exact-value rounding in Spark
    assert spark_cents(90071992547410.10) == 9007199254741010  # not ...09
    # fact 2: same double, different engines, different cents
    v2 = 90071992547409.95
    assert spark_cents(v2) == 9007199254740995
    assert duck_cents(v2) == 9007199254740996
    # fact 3: duck's literal path is a third double entirely
    lit_double, lit_cents = con.execute(
        "SELECT 90071992547409.93::DOUBLE, "
        "CAST(CAST(90071992547409.93::DOUBLE AS DECIMAL(18,2)) * 100 "
        "AS BIGINT)").fetchone()
    assert lit_double != 90071992547409.93
    assert lit_cents == 9007199254740992
    # fact 4: in-domain agreement witness (family-5 value class)
    assert spark_cents(123456789012.34) == duck_cents(123456789012.34) \
        == 12345678901234
    con.close()


# Fixtures are pulled lazily via request.getfixturevalue so a -k subset
# of non-UNIQUE_ID_CONTRACT queries never pays the duplicate twin-free
# table build (r8 review finding).
def _edge_parity(spark, request, name):
    variant = "_unique" if name in UNIQUE_ID_CONTRACT else ""
    duck = request.getfixturevalue(f"edge_duck{variant}")
    path = request.getfixturevalue(f"edge_dir{variant}")
    if name in NONFINITE_DECIMAL_CONTRACT:
        rq = registry.get(name)
        with pytest.raises(Exception, match="NON_FINITE_MEASURE"):
            rq.fn(spark, path).toPandas()
        # DuckDB's loud failure surfaces as ConversionException for
        # ±inf and InvalidInputException for NaN — pin the base class.
        with pytest.raises(duckdb.Error, match="(?i)cast"):
            duck.execute(rq.oracle).df()
        return
    assert_query_parity(spark, duck, path, name)


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_parity(spark, request, name):
    _edge_parity(spark, request, name)


# ---------------------------------------------------------------------------
# Standing full-registry sweep (r7 verdict item 2).  The one-time manual
# sweep mid-r7 found nine parity-blind bugs; this pins the sweep itself:
# EVERY oracled query runs against the edge-augmented tables, so the next
# NULL/tie/degenerate-sensitive operator fails a named gate at commit
# time instead of waiting for the next manual exercise.  It multiplies
# the suite's Spark time (~109 queries x 2 runs), so it is opt-in:
#     SPARK_GRAFT_EDGE_SWEEP=1 python -m pytest tests/test_edge_parity.py
# or the scripted entry point  python scripts/edge_sweep.py
# (run it before every round-end commit and after any operator change —
# the curated EDGE_QUERIES list above stays in the default suite as the
# fast regression net for past finds).

import os

_FULL_SWEEP = os.environ.get("SPARK_GRAFT_EDGE_SWEEP") == "1"
_ALL_ORACLED = sorted(n for n, rq in registry.REGISTRY.items() if rq.oracle)


@pytest.mark.skipif(
    not _FULL_SWEEP,
    reason="full-registry edge sweep: set SPARK_GRAFT_EDGE_SWEEP=1 "
           "(or run scripts/edge_sweep.py)",
)
@pytest.mark.parametrize("name", [n for n in _ALL_ORACLED if n not in EDGE_QUERIES])
def test_edge_parity_full_sweep(spark, request, name):
    _edge_parity(spark, request, name)


# ---------------------------------------------------------------------------
# Empty-slice sweep (r8): every oracled query against ZERO-ROW copies of
# all tables — the routine at-scale degenerate case (an upstream filter
# that matched nothing, an empty partition, a brand-new ingest dir).
# Runs under the same opt-in flag as the full sweep.
#
# Pinned divergence: Spark's rollup/cube/grouping-sets emit ZERO rows on
# empty input, where the SQL standard (and DuckDB) emit the grand-total
# grouping-set row — upstream Spark semantics, asserted explicitly here
# so a future Spark version changing it fails loud instead of silently
# shifting results.

EMPTY_GRANDTOTAL_DIVERGENT = {"agg_rollup", "agg_cube", "agg_grouping_sets"}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("empty_sf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet' LIMIT 0) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def empty_duck(empty_dir):
    con = _duck_for(empty_dir)
    yield con
    con.close()


@pytest.mark.skipif(
    not _FULL_SWEEP,
    reason="empty-slice sweep: set SPARK_GRAFT_EDGE_SWEEP=1 "
           "(or run scripts/edge_sweep.py)",
)
@pytest.mark.parametrize("name", _ALL_ORACLED)
def test_empty_slice_parity(spark, empty_duck, empty_dir, name):
    if name in EMPTY_GRANDTOTAL_DIVERGENT:
        got = registry.get(name).fn(spark, empty_dir)
        exp = empty_duck.execute(registry.get(name).oracle).df()
        assert got.count() == 0, "Spark semantics changed: update the pin"
        assert len(exp) == 1, "oracle lost the SQL grand-total row"
        return
    assert_query_parity(spark, empty_duck, empty_dir, name)


# ---------------------------------------------------------------------------
# Single-row sweep (r9, family 7b): every table reduced to exactly ONE
# deterministic row — the degenerate-cardinality case between "empty"
# and "normal" (windows of one, joins with at most one match, quantiles
# and moments of a singleton, LSH bands with one member, top-k with
# k > n).  Same opt-in flag.

_ONE_ROW_ORDER = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey, l_linenumber", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}


@pytest.fixture(scope="module")
def singlerow_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("singlerow_sf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet' "
            f"ORDER BY {_ONE_ROW_ORDER[t]} LIMIT 1) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def singlerow_duck(singlerow_dir):
    con = _duck_for(singlerow_dir)
    yield con
    con.close()


@pytest.mark.skipif(
    not _FULL_SWEEP,
    reason="single-row sweep: set SPARK_GRAFT_EDGE_SWEEP=1 "
           "(or run scripts/edge_sweep.py)",
)
@pytest.mark.parametrize("name", _ALL_ORACLED)
def test_single_row_parity(spark, singlerow_duck, singlerow_dir, name):
    assert_query_parity(spark, singlerow_duck, singlerow_dir, name)


# ---------------------------------------------------------------------------
# All-NULL-column sweep (r9, family 7c): every NON-KEY column of the six
# fact/content tables is NULL in EVERY row (ids and join keys keep their
# values — NULLing those is covered row-wise by families 1/4/5).  This
# is the "new feed with a broken extractor" shape: aggregates over a
# 100%-NULL measure (sum → NULL, count(col) → 0), group-bys where the
# only key value is NULL, text operators over an all-NULL corpus.
# The dims (region/nation/part/supplier) stay intact so dim joins still
# resolve and the NULL blast radius is attributable.

_ALL_NULL_COLS = {
    "customer": ["c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderdate",
               "o_orderpriority"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["ts", "event_type", "value", "props"],
    "documents": ["text", "lang", "source", "n_chars"],
    "embeddings": ["embedding", "label"],
}


@pytest.fixture(scope="module")
def allnull_dir(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("allnull_sf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        nulled = _ALL_NULL_COLS.get(t, [])
        cols = con.execute(
            f"DESCRIBE SELECT * FROM '{SF_DIR}/{t}.parquet'"
        ).fetchall()
        sel = ", ".join(
            f"CAST(NULL AS {typ}) AS {name}" if name in nulled else name
            for name, typ, *_ in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SF_DIR}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def allnull_duck(allnull_dir):
    con = _duck_for(allnull_dir)
    yield con
    con.close()


@pytest.mark.skipif(
    not _FULL_SWEEP,
    reason="all-NULL-column sweep: set SPARK_GRAFT_EDGE_SWEEP=1 "
           "(or run scripts/edge_sweep.py)",
)
@pytest.mark.parametrize("name", _ALL_ORACLED)
def test_all_null_column_parity(spark, allnull_duck, allnull_dir, name):
    assert_query_parity(spark, allnull_duck, allnull_dir, name)
