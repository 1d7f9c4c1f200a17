#!/usr/bin/env python3
"""Float-parity de-risking audit: for every judged query family that rounds
a derived double (cosine 4dp; ln/sqrt/pow/trig 6dp), measure how close the
RAW values come to a rounding half-boundary. Spark rounds the exact decimal
expansion of the double (BigDecimal HALF_UP) while DuckDB rounds via
double-scaled nearbyint — the two agree unless a value sits within a few
ulps of a boundary. This audit proves the fixture data keeps a wide margin
(round-2 result at sf0.1: worst case ~50-100 ulps), so cross-engine libm
drift cannot flip an oracle hash.

Usage: audit_float_boundaries.py [sfDir]   (default /root/testdata/sf0.1)
Re-run whenever a new judged query rounds a freshly-derived double.
"""
import duckdb, math, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
con = duckdb.connect()
for t in ["documents", "embeddings", "orders", "customer", "lineitem", "events"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

AUDITS = [
    ("cosine pairs (4dp)", 4, """
      SELECT list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 256 AND b.vec_id < 256"""),
    ("tfidf ln terms (6dp)", 6, """
      WITH toks AS (SELECT doc_id, unnest(str_split(text,' ')) AS token FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) tf FROM toks GROUP BY 1,2),
      df AS (SELECT token, COUNT(DISTINCT doc_id) df FROM toks GROUP BY 1),
      n AS (SELECT COUNT(*) n FROM documents)
      SELECT tf * ln(CAST(n AS DOUBLE)/df) FROM tf JOIN df USING (token) CROSS JOIN n"""),
    ("unigram ln(p) (6dp)", 6, """
      WITH toks AS (SELECT unnest(str_split(text,' ')) AS token FROM documents),
      vocab AS (SELECT token, COUNT(*) freq FROM toks GROUP BY 1),
      tot AS (SELECT COUNT(*) n FROM toks)
      SELECT DISTINCT ln(CAST(freq AS DOUBLE)/n) FROM vocab CROSS JOIN tot"""),
    ("sqrt(totalprice) (6dp)", 6, "SELECT sqrt(o_totalprice) FROM orders"),
    ("ln(totalprice) (6dp)", 6, "SELECT ln(o_totalprice) FROM orders"),
    ("log10(totalprice) (6dp)", 6, "SELECT log10(o_totalprice) FROM orders"),
    ("pow(price/1e5, 2) (6dp)", 6, "SELECT pow(o_totalprice/100000, 2) FROM orders"),
    ("sin(acctbal/1000) (6dp)", 6, "SELECT sin(c_acctbal/1000) FROM customer"),
    ("cos(acctbal/1000) (6dp)", 6, "SELECT cos(c_acctbal/1000) FROM customer"),
    ("atan2(acctbal, 5000) (6dp)", 6, "SELECT atan2(c_acctbal, 5000.0) FROM customer"),
    ("norms (4dp)", 4, """
      SELECT sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x)))
      FROM embeddings"""),
    # round-11 additions: every freshly rounded derived double
    ("markov/benford/novelty count ratios (6dp)", 6, """
      WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
      t AS (SELECT SUM(n) AS nt FROM c)
      SELECT CAST(a.n AS DOUBLE) / CAST(b.n AS DOUBLE) FROM c a, c b
      UNION ALL SELECT CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) FROM c CROSS JOIN t"""),
    ("cohort value micro-scaling (round0)", 0, """
      SELECT value * 1000000 FROM events WHERE event_type = 'purchase'"""),
    ("cadence cv2 chain (6dp)", 6, """
      WITH g AS (SELECT user_id,
          (epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)) // 1000000 AS g
        FROM events),
      s AS (SELECT user_id, COUNT(*) AS n, CAST(SUM(g) AS BIGINT) AS sg,
              CAST(SUM(g*g) AS BIGINT) AS sg2
            FROM g WHERE g IS NOT NULL GROUP BY 1)
      SELECT (CAST(n AS DOUBLE)*CAST(sg2 AS DOUBLE) - CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE))
             / (CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE))
      FROM s WHERE n >= 30 AND sg > 0"""),
    ("anisotropy bucket mean (6dp)", 6, """
      WITH p AS (SELECT round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          CAST(b.embedding AS DOUBLE[])), 4) AS cos
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 97),
      bk AS (SELECT CAST(floor(cos*10) AS INT) AS bucket,
               CAST(round(cos*10000, 0) AS BIGINT) AS c4 FROM p)
      SELECT CAST(SUM(c4) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 10000.0
      FROM bk GROUP BY bucket"""),
    ("pagerank/ltv/attribution scaled-long re-projection (6dp)", 6, """
      -- x = m/1e6 for integer m: distance to a 6dp half-boundary is ~0.5 by
      -- construction; measured anyway to keep the audit exhaustive
      SELECT CAST(CAST(round(value * 1000000, 0) AS BIGINT) AS DOUBLE) / 1000000.0
      FROM events WHERE event_type = 'purchase'"""),
    ("zipf slope (6dp)", 6, """
      WITH tf AS (SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents) GROUP BY 1),
      top AS (SELECT token, freq FROM tf ORDER BY freq DESC, token LIMIT 200),
      ranked AS (SELECT
          CAST(round(round(ln(CAST(row_number() OVER (ORDER BY freq DESC, token) AS DOUBLE)), 6) * 1000000, 0) AS BIGINT) AS x,
          CAST(round(round(ln(CAST(freq AS DOUBLE)), 6) * 1000000, 0) AS BIGINT) AS y
        FROM top),
      s AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) sx, CAST(SUM(y) AS BIGINT) sy,
              CAST(SUM(x*y) AS BIGINT) sxy, CAST(SUM(x*x) AS BIGINT) sxx FROM ranked)
      SELECT CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) FROM s"""),
    ("benford log10 reference (6dp)", 6, """
      SELECT log10(1.0 + 1.0 / CAST(d AS DOUBLE)) FROM generate_series(1, 9) t(d)"""),
    ("covisitation cosine (6dp)", 6, """
      WITH vi AS (SELECT DISTINCT user_id,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        FROM events WHERE event_type = 'view'),
      ic AS (SELECT item, COUNT(*) AS n FROM vi GROUP BY 1),
      pairs AS (SELECT a.item AS ia, b.item AS ib, COUNT(*) AS n_both
        FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2)
      SELECT n_both / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))
      FROM pairs JOIN ic na ON na.item = ia JOIN ic nb ON nb.item = ib"""),
    ("rm3 tf/dl scaled-long projection (round0)", 0, """
      WITH toks AS (SELECT doc_id, str_split(text, ' ') AS parts FROM documents),
      tf AS (SELECT doc_id, len(parts) AS dl, term, COUNT(*) AS tf
             FROM (SELECT doc_id, parts, unnest(parts) AS term FROM toks)
             GROUP BY 1, 2, 3)
      SELECT CAST(tf AS DOUBLE) / dl * 1000000000000.0 FROM tf"""),
    ("covisitation pmi + sppmi shift (6dp)", 6, """
      WITH vi AS (SELECT DISTINCT user_id,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        FROM events WHERE event_type = 'view'),
      tot AS (SELECT COUNT(*) AS u_total FROM vi),
      ic AS (SELECT item, COUNT(*) AS n FROM vi GROUP BY 1),
      pairs AS (SELECT a.item ia, b.item ib, COUNT(*) AS n_both
        FROM vi a JOIN vi b ON a.user_id = b.user_id AND a.item < b.item
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      p AS (SELECT ln(CAST(n_both AS DOUBLE) * CAST(u_total AS DOUBLE)
              / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))) AS pmi
            FROM pairs JOIN ic na ON na.item = ia JOIN ic nb ON nb.item = ib
            CROSS JOIN tot)
      SELECT pmi FROM p UNION ALL SELECT pmi - ln(5.0) FROM p"""),
    ("kneser-ney bigram probability (6dp)", 6, """
      WITH toksl AS (SELECT doc_id, str_split(text, ' ') AS parts FROM documents),
      bi AS (SELECT unnest(list_transform(generate_series(1, len(parts) - 1),
               i -> parts[i] || ' ' || parts[i + 1])) AS bg
             FROM toksl WHERE len(parts) >= 2),
      bc AS (SELECT bg, str_split(bg, ' ')[1] AS w1, str_split(bg, ' ')[2] AS w2,
               COUNT(*) AS cb FROM bi GROUP BY 1, 2, 3),
      hist AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS c1, COUNT(*) AS n1p
               FROM bc GROUP BY 1),
      cont AS (SELECT w2, COUNT(*) AS n1c FROM bc GROUP BY 1),
      tot AS (SELECT COUNT(*) AS tt FROM bc)
      SELECT (CAST(cb AS DOUBLE) - 0.75) / CAST(c1 AS DOUBLE)
          + 0.75 * (CAST(n1p AS DOUBLE) / CAST(c1 AS DOUBLE))
            * (CAST(n1c AS DOUBLE) / CAST(tt AS DOUBLE))
      FROM bc JOIN hist USING (w1) JOIN cont USING (w2) CROSS JOIN tot"""),
    ("dirichlet query-likelihood ln terms (6dp)", 6, """
      WITH toks AS (SELECT doc_id, str_split(text, ' ') AS parts FROM documents),
      stats AS (SELECT CAST(SUM(len(parts)) AS DOUBLE) AS ctot,
        CAST(SUM(len(list_filter(parts, x -> x = 'dup'))) AS DOUBLE) AS cf_dup,
        CAST(SUM(len(list_filter(parts, x -> x = 'vector'))) AS DOUBLE) AS cf_vector,
        CAST(SUM(len(list_filter(parts, x -> x = 'window'))) AS DOUBLE) AS cf_window
        FROM toks)
      SELECT ln((CAST(len(list_filter(parts, x -> x = t.tm)) AS DOUBLE)
          + 2000.0 * (CASE t.tm WHEN 'dup' THEN cf_dup
              WHEN 'vector' THEN cf_vector ELSE cf_window END / ctot))
        / (CAST(len(parts) AS DOUBLE) + 2000.0))
      FROM toks CROSS JOIN stats
      CROSS JOIN (SELECT unnest(['dup','vector','window']) AS tm) t"""),
    ("rake word-score scaling (round0)", 0, """
      WITH t0 AS (SELECT doc_id, str_split(text, ' ') AS parts FROM documents),
      tok AS (SELECT doc_id, pos, parts[pos] AS token,
                parts[pos] IN ('the','a','of','and','to','in') AS stop
              FROM (SELECT doc_id, parts,
                      unnest(generate_series(1, len(parts))) AS pos FROM t0)),
      ph0 AS (SELECT doc_id, pos, token, stop,
                CAST(SUM(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
              FROM tok),
      ph AS (SELECT doc_id, sid, COUNT(*) AS plen
             FROM ph0 WHERE NOT stop GROUP BY 1, 2),
      pw AS (SELECT p.plen, token AS word FROM ph0 t
             JOIN ph p ON p.doc_id = t.doc_id AND p.sid = t.sid
             WHERE NOT t.stop)
      SELECT CAST(SUM(plen) AS DOUBLE) / COUNT(*) * 1000000.0
      FROM pw GROUP BY word"""),
    ("calibration score micro-scaling (round0)", 0, """
      SELECT CAST(len(list_filter(str_split(text, ' '),
               w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
             / NULLIF(len(str_split(text, ' ')), 0) * 1000000.0
      FROM documents WHERE text IS NOT NULL"""),
    ("psi per-bin (p-q)ln(p/q) terms (6dp)", 6, """
      WITH f AS (
        SELECT source,
          CAST(len(list_filter(str_split(text, ' '),
                 w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
            / NULLIF(len(str_split(text, ' ')), 0) AS score
        FROM documents WHERE text IS NOT NULL),
      b AS (SELECT source, least(CAST(floor(score * 10) AS BIGINT), 9) AS bucket
            FROM f WHERE score IS NOT NULL),
      counts AS (SELECT source, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2),
      grid AS (SELECT source, g.bucket
        FROM (SELECT DISTINCT source FROM counts)
        CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) g),
      dense AS (SELECT g.source, g.bucket, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM grid g LEFT JOIN counts c
          ON c.source = g.source AND c.bucket = g.bucket),
      tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_src FROM dense GROUP BY 1),
      ref AS (SELECT bucket, n AS n_ref FROM dense WHERE source = 'src0'),
      rtot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS n_ref_tot FROM ref)
      SELECT (CAST(d.n + 1 AS DOUBLE) / CAST(t.n_src + 10 AS DOUBLE)
          - CAST(r.n_ref + 1 AS DOUBLE) / CAST(rt.n_ref_tot + 10 AS DOUBLE))
        * ln((CAST(d.n + 1 AS DOUBLE) / CAST(t.n_src + 10 AS DOUBLE))
           / (CAST(r.n_ref + 1 AS DOUBLE) / CAST(rt.n_ref_tot + 10 AS DOUBLE)))
      FROM dense d JOIN tot t USING (source) JOIN ref r USING (bucket)
      CROSS JOIN rtot rt WHERE d.source <> 'src0'"""),
    ("jsd half-sum terms (6dp)", 6, """
      WITH toks AS (
        SELECT source, unnest(str_split(text, ' ')) AS token FROM documents),
      st AS (SELECT source, token, COUNT(*) AS n_st FROM toks GROUP BY 1, 2),
      tt AS (SELECT token, COUNT(*) AS n_t FROM toks GROUP BY 1),
      stot AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s FROM st GROUP BY 1),
      gtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
      dense AS (
        SELECT stot.source, stot.n_s, tt.token, tt.n_t,
          CAST(COALESCE(st.n_st, 0) AS BIGINT) AS n_st
        FROM tt CROSS JOIN stot
        LEFT JOIN st ON st.source = stot.source AND st.token = tt.token)
      SELECT (CASE WHEN n_st > 0 THEN
           (CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
           * ln((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
               / ((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                  + CAST(n_t - n_st AS DOUBLE) / CAST(n - n_s AS DOUBLE)) / 2.0))
         ELSE 0.0 END
         + CASE WHEN n_t - n_st > 0 THEN
           (CAST(n_t - n_st AS DOUBLE) / CAST(n - n_s AS DOUBLE))
           * ln((CAST(n_t - n_st AS DOUBLE) / CAST(n - n_s AS DOUBLE))
               / ((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE)
                  + CAST(n_t - n_st AS DOUBLE) / CAST(n - n_s AS DOUBLE)) / 2.0))
         ELSE 0.0 END) / 2.0
      FROM dense CROSS JOIN gtot"""),
    ("km hazard ln terms (6dp) + exp of cum (6dp)", 6, """
      WITH dd AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      runs AS (
        SELECT user_id, day,
          day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                AS INTEGER) AS grp
        FROM dd),
      lf AS (SELECT COUNT(*) AS life,
               MAX(day) < DATE '2024-01-30' AS churned
             FROM runs GROUP BY user_id, grp),
      g AS (SELECT life, COUNT(*) AS leave_n,
              CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d
            FROM lf GROUP BY 1),
      r AS (SELECT life, leave_n, d,
              CAST(SUM(leave_n) OVER (ORDER BY life
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                AS n_risk
            FROM g),
      e AS (SELECT life, n_risk, d,
              CAST(SUM(CASE WHEN d < n_risk THEN
                CAST(round(round(ln(CAST(n_risk - d AS DOUBLE)
                  / CAST(n_risk AS DOUBLE)), 6) * 1000000, 0) AS BIGINT)
                END) OVER (ORDER BY life ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS log_s
            FROM r)
      SELECT ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
      FROM r WHERE d < n_risk
      UNION ALL
      SELECT exp(CAST(log_s AS DOUBLE) / 1000000.0)
      FROM e WHERE d > 0 AND d < n_risk"""),
    ("heaps cumulative ln points (6dp)", 6, """
      WITH toks AS (
        SELECT doc_id, unnest(str_split(text, ' ')) AS token
        FROM documents WHERE text IS NOT NULL),
      per_doc AS (SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY 1),
      first_seen AS (
        SELECT doc_id, COUNT(*) AS new_types
        FROM (SELECT token, MIN(doc_id) AS doc_id FROM toks GROUP BY 1)
        GROUP BY 1),
      cum AS (
        SELECT
          SUM(p.n_toks) OVER (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING)
            AS t_cum,
          SUM(COALESCE(f.new_types, 0)) OVER (ORDER BY p.doc_id
            ROWS UNBOUNDED PRECEDING) AS v_cum
        FROM per_doc p LEFT JOIN first_seen f USING (doc_id))
      SELECT ln(CAST(t_cum AS DOUBLE)) FROM cum
      UNION ALL SELECT ln(CAST(v_cum AS DOUBLE)) FROM cum"""),
    ("rbo depth terms (round0)", 0, """
      SELECT CAST(1000000 AS DOUBLE) * aa.a
        / (dd.d * (CAST(1 AS BIGINT) << CAST(dd.d AS INT)))
      FROM (SELECT unnest(generate_series(1, 5)) AS d) dd,
           (SELECT unnest(generate_series(1, 5)) AS a) aa
      WHERE aa.a <= dd.d"""),
    ("adamic-adar user weight (round0)", 0, """
      WITH vi AS (
        SELECT DISTINCT user_id,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        FROM events
        WHERE event_type = 'view'
          AND json_extract_string(props, '$.k') IS NOT NULL)
      SELECT CAST(1000000 AS DOUBLE) / ln(CAST(COUNT(*) AS DOUBLE))
      FROM vi GROUP BY user_id HAVING COUNT(*) >= 2"""),
    ("ece bucket gaps (6dp)", 6, """
      WITH f AS (
        SELECT CAST(len(list_filter(str_split(text, ' '),
                 w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
               / NULLIF(len(str_split(text, ' ')), 0) AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE text IS NOT NULL),
      b AS (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bucket,
              CAST(round(score * 1000000.0, 0) AS BIGINT) AS s6, y
            FROM f WHERE score IS NOT NULL)
      SELECT abs(CAST(SUM(y) AS DOUBLE) / COUNT(*)
        - CAST(SUM(s6) AS DOUBLE) / COUNT(*) / 1000000.0)
      FROM b GROUP BY bucket"""),
    ("entropy-rate ln terms (6dp)", 6, """
      WITH lab AS (
        SELECT user_id, event_id, event_type, ts,
          SUM(CASE WHEN gap_us IS NULL OR gap_us > 30 * 60 * 1000000
            THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
        FROM (SELECT user_id, event_id, event_type, ts,
                epoch_us(CAST(ts AS TIMESTAMP))
                  - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
              FROM events)),
      tr AS (
        SELECT event_type AS prev_type, session_id,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS next_type,
          lead(session_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS next_sess
        FROM lab),
      cnt AS (SELECT prev_type, next_type, COUNT(*) AS n FROM tr
              WHERE next_type IS NOT NULL AND next_sess = session_id
              GROUP BY 1, 2),
      tot AS (SELECT prev_type, SUM(n) AS n_prev FROM cnt GROUP BY 1)
      SELECT ln(CAST(n AS DOUBLE) / CAST(n_prev AS DOUBLE))
      FROM cnt JOIN tot USING (prev_type)"""),
    ("mmd pairing cosines (4dp)", 4, """
      WITH x AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          row_number() OVER (ORDER BY vec_id) - 1 AS r
        FROM embeddings WHERE label BETWEEN 0 AND 4),
      y AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
          row_number() OVER (ORDER BY vec_id) - 1 AS r
        FROM embeddings WHERE label BETWEEN 5 AND 9),
      x1 AS (SELECT r // 2 AS pair_id, v FROM x WHERE r % 2 = 0),
      x2 AS (SELECT r // 2 AS pair_id, v FROM x WHERE r % 2 = 1),
      y1 AS (SELECT r // 2 AS pair_id, v FROM y WHERE r % 2 = 0),
      y2 AS (SELECT r // 2 AS pair_id, v FROM y WHERE r % 2 = 1),
      j AS (SELECT x1.v AS a, x2.v AS b, y1.v AS c, y2.v AS d
        FROM x1 JOIN x2 USING (pair_id) JOIN y1 USING (pair_id)
        JOIN y2 USING (pair_id))
      SELECT list_cosine_similarity(a, b) FROM j
      UNION ALL SELECT list_cosine_similarity(c, d) FROM j
      UNION ALL SELECT list_cosine_similarity(a, d) FROM j
      UNION ALL SELECT list_cosine_similarity(b, c) FROM j"""),
    ("brier squared errors (6dp)", 6, """
      WITH f AS (
        SELECT CAST(len(list_filter(str_split(text, ' '),
                 w -> w IN ('the','a','of','and','to','in'))) AS DOUBLE)
               / NULLIF(len(str_split(text, ' ')), 0) AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM documents WHERE text IS NOT NULL)
      SELECT (score - y) * (score - y) FROM f WHERE score IS NOT NULL"""),
    ("jl component micro-scaling (6dp)", 6, """
      WITH p AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT v[unnest(generate_series(1, len(v)))] FROM p"""),
    ("neyman weight sqrt (round0)", 0, """
      WITH st AS (SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS sx,
          CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY 1)
      SELECT sqrt(CAST(n_docs * sxx - sx * sx AS DOUBLE)) FROM st"""),
    ("silhouette ratio (6dp)", 6, """
      WITH cent AS (SELECT vec_id AS centroid_id,
          CAST(embedding AS DOUBLE[]) AS centroid
        FROM embeddings WHERE vec_id < 8),
      sc AS (SELECT v.vec_id, c.centroid_id,
          CAST(round(round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
            c.centroid), 4) * 10000, 0) AS BIGINT) AS c4
        FROM embeddings v CROSS JOIN cent c WHERE v.vec_id >= 32),
      rk AS (SELECT vec_id, c4, row_number() OVER (
          PARTITION BY vec_id ORDER BY c4 DESC, centroid_id) AS rn FROM sc),
      pv AS (SELECT vec_id,
          MAX(CASE WHEN rn = 1 THEN c4 END) AS c1,
          MAX(CASE WHEN rn = 2 THEN c4 END) AS c2
        FROM rk WHERE rn <= 2 GROUP BY 1)
      SELECT CAST(c1 - c2 AS DOUBLE) / CAST(10000 - c2 AS DOUBLE)
      FROM pv WHERE c2 < 10000"""),
    ("facility-coreset cosines (4dp)", 4, """
      SELECT list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
               CAST(b.embedding AS DOUBLE[]))
      FROM embeddings a JOIN embeddings b
        ON substring(md5('1:' || CAST(a.vec_id AS VARCHAR)), 1, 1) = '0'
       AND a.vec_id <> b.vec_id"""),
]

worst_overall = 1.0
for name, scale, sql in AUDITS:
    rows = con.execute(sql).fetchall()
    step = 10 ** -scale
    worst = 1.0
    for (v,) in rows:
        if v is None or math.isnan(v) or math.isinf(v):
            continue
        frac = abs(v) / step % 1.0
        worst = min(worst, abs(frac - 0.5))
    # ulp margin at the worst point: boundary distance in absolute terms vs
    # ulp of a typical value magnitude
    print(f"{name:32s} n={len(rows):7d} worst half-boundary distance = {worst:.3e} half-units")
    worst_overall = min(worst_overall, worst)

print(f"== worst overall: {worst_overall:.3e} half-units "
      f"({'SAFE' if worst_overall > 1e-9 else 'DANGER: value near rounding boundary'})")
sys.exit(0 if worst_overall > 1e-9 else 1)
