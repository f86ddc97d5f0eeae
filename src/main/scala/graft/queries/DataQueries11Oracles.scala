package graft.queries

/** DuckDB oracle SQL for the eleventh wave (split from DataQueries11 to
  * keep each file reviewable).
  */
object DataQueries11Oracles {

  val oracles: Map[String, String] = Map(
    "d101_prefix_filter" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE len(string_split(text,' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, unnest([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN generate_series(1,len(w)-2)]) AS s FROM w),
        |g AS (SELECT doc_id, CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) AS g FROM sh),
        |df AS (SELECT g, count(*) AS df FROM g GROUP BY g),
        |n AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |r AS (SELECT g.doc_id, g.g, row_number() OVER (PARTITION BY g.doc_id ORDER BY df.df, g.g) AS rk, n.n
        |      FROM g JOIN df ON g.g = df.g JOIN n ON g.doc_id = n.doc_id),
        |pre AS (SELECT doc_id, g FROM r WHERE rk <= n - ((4*n + 4)//5) + 1),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM pre x JOIN pre y ON x.g = y.g AND x.doc_id < y.doc_id),
        |iv AS (SELECT c.a, c.b, count(*) AS inter FROM cand c
        |       JOIN g ga ON ga.doc_id = c.a JOIN g gb ON gb.doc_id = c.b AND ga.g = gb.g
        |       GROUP BY c.a, c.b)
        |SELECT iv.a, iv.b, CAST(iv.inter AS BIGINT) AS inter,
        |  CAST(na.n + nb.n - iv.inter AS BIGINT) AS uni
        |FROM iv JOIN n na ON na.doc_id = iv.a JOIN n nb ON nb.doc_id = iv.b
        |WHERE iv.inter * 5 >= (na.n + nb.n - iv.inter) * 4
        |ORDER BY a, b""".stripMargin,

    "d102_rrf_hybrid" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl,
        |  CAST(len(list_filter(w, x -> x = 'join')) AS DOUBLE) AS tf0,
        |  CAST(len(list_filter(w, x -> x = 'scan')) AS DOUBLE) AS tf1,
        |  CAST(len(list_filter(w, x -> x = 'vector')) AS DOUBLE) AS tf2 FROM d),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS sumdl,
        |  sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |  sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |  sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2 FROM t),
        |sc AS (SELECT doc_id,
        |  ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))
        |  + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))
        |  + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl / (sumdl / n))) AS score
        |FROM t, st),
        |bm AS (SELECT doc_id, row_number() OVER (ORDER BY CAST(floor(score*1000000.0) AS BIGINT) DESC, doc_id) AS r
        |       FROM sc ORDER BY r LIMIT 50),
        |e AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings),
        |n2 AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(0.0::DOUBLE, [x*x FOR x IN v]), (a,b)->a+b)) AS nrm FROM e),
        |qv AS (SELECT v AS q, qn FROM (SELECT v, nrm AS qn FROM n2 WHERE vec_id = 0)),
        |cs AS (SELECT vec_id AS doc_id,
        |        list_reduce(list_prepend(0.0::DOUBLE, [q[i]*v[i] FOR i IN generate_series(1,len(v))]), (a,b)->a+b) / (qn*nrm) AS cos
        |       FROM n2 CROSS JOIN qv WHERE vec_id <> 0),
        |dn AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS r
        |       FROM cs ORDER BY r LIMIT 50),
        |f AS (SELECT coalesce(bm.doc_id, dn.doc_id) AS doc_id,
        |        coalesce(1000000000 // (60 + bm.r), 0) + coalesce(1000000000 // (60 + dn.r), 0) AS rrf_q9,
        |        bm.r AS bm25_rank, dn.r AS dense_rank
        |      FROM bm FULL OUTER JOIN dn ON bm.doc_id = dn.doc_id)
        |SELECT doc_id, CAST(rrf_q9 AS BIGINT) AS rrf_q9, CAST(bm25_rank AS BIGINT) AS bm25_rank,
        |  CAST(dense_rank AS BIGINT) AS dense_rank
        |FROM f ORDER BY rrf_q9 DESC, doc_id LIMIT 20""".stripMargin,

    "d103_silhouette" ->
      """WITH e AS (SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS xq FROM embeddings),
        |c AS (SELECT vec_id AS cid, xq AS cq FROM e WHERE vec_id < 4),
        |d AS (SELECT e.vec_id, c.cid,
        |        list_reduce(list_prepend(0::BIGINT, [(e.xq[i]-c.cq[i])*(e.xq[i]-c.cq[i]) FOR i IN generate_series(1,len(e.xq))]), (acc, v) -> acc + v) AS d2
        |      FROM e CROSS JOIN c),
        |a AS (SELECT vec_id, d2 AS a_d2, cid AS cell FROM
        |        (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d)
        |      WHERE rn = 1),
        |b AS (SELECT d.vec_id, min(d.d2) AS b_d2 FROM d JOIN a ON d.vec_id = a.vec_id AND d.cid <> a.cell GROUP BY d.vec_id),
        |s AS (SELECT a.vec_id, a.cell,
        |        CAST(((b.b_d2 - a.a_d2)::HUGEINT * 1000000) // greatest(a.a_d2, b.b_d2, 1) AS BIGINT) AS s_q6
        |      FROM a JOIN b ON a.vec_id = b.vec_id)
        |SELECT cell, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(s_q6) // count(*) AS BIGINT) AS mean_s_q6
        |FROM s GROUP BY cell ORDER BY cell""".stripMargin,

    "d104_band_sweep" ->
      (s"WITH ${DataQueries.minhashPairsCte},\n" +
        """cfg AS (SELECT unnest([2, 4, 8]) AS bands),
          |allbands AS (
          |  SELECT 2 AS bands, doc_id, b.band, b.bh FROM sig, LATERAL (VALUES
          |    (0, m0||'|'||m1||'|'||m2||'|'||m3||'|'||m4||'|'||m5||'|'||m6||'|'||m7),
          |    (1, m8||'|'||m9||'|'||m10||'|'||m11||'|'||m12||'|'||m13||'|'||m14||'|'||m15)) AS b(band, bh)
          |  UNION ALL
          |  SELECT 4, doc_id, b.band, b.bh FROM sig, LATERAL (VALUES
          |    (0, m0||'|'||m1||'|'||m2||'|'||m3), (1, m4||'|'||m5||'|'||m6||'|'||m7),
          |    (2, m8||'|'||m9||'|'||m10||'|'||m11), (3, m12||'|'||m13||'|'||m14||'|'||m15)) AS b(band, bh)
          |  UNION ALL
          |  SELECT 8, doc_id, b.band, b.bh FROM sig, LATERAL (VALUES
          |    (0, m0||'|'||m1), (1, m2||'|'||m3), (2, m4||'|'||m5), (3, m6||'|'||m7),
          |    (4, m8||'|'||m9), (5, m10||'|'||m11), (6, m12||'|'||m13), (7, m14||'|'||m15)) AS b(band, bh)),
          |p AS (SELECT DISTINCT bands, x.doc_id AS a, y.doc_id AS b
          |      FROM allbands x JOIN allbands y USING (bands)
          |      WHERE x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)
          |SELECT CAST(cfg.bands AS BIGINT) AS bands, CAST(16 // cfg.bands AS BIGINT) AS rows_per_band,
          |  CAST(coalesce(count(p.a), 0) AS BIGINT) AS n_pairs,
          |  CAST(floor(pow(1.0 / cfg.bands, 1.0 / (16 // cfg.bands)) * 1000000.0) AS BIGINT) AS thresh_q6
          |FROM cfg LEFT JOIN p ON p.bands = cfg.bands
          |GROUP BY cfg.bands ORDER BY bands""".stripMargin),

    "d105_graph_stats" ->
      (s"WITH ${DataQueries.minhashPairsCte},\n" +
        """edges AS (SELECT a, b FROM pairs),
          |deg AS (SELECT n, count(*) AS d FROM (SELECT a AS n FROM edges UNION ALL SELECT b FROM edges) GROUP BY n),
          |tri AS (SELECT count(*) AS t FROM edges e1 JOIN edges e2 ON e2.a = e1.b JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
          |wd AS (SELECT sum((d*(d-1))//2) AS w FROM deg)
          |SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
          |  CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
          |  CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_degree,
          |  CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
          |  CAST((SELECT w FROM wd) AS BIGINT) AS n_wedges,
          |  CAST(CASE WHEN (SELECT w FROM wd) > 0 THEN floor((SELECT t FROM tri) * 3000000.0 / (SELECT w FROM wd)) ELSE 0 END AS BIGINT) AS cc_q6""".stripMargin),

    "d106_weighted_sample" ->
      """WITH b AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS w,
        |  (CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),19,8)) AS BIGINT) + 1) / 4294967297.0 AS u
        |FROM documents),
        |k AS (SELECT doc_id, w, CAST(floor(ln(u)/w * 1000000000.0) AS BIGINT) AS key_q9 FROM b WHERE w > 0)
        |SELECT CAST(row_number() OVER (ORDER BY key_q9 DESC, doc_id) AS BIGINT) AS rank,
        |  doc_id, w AS weight, key_q9
        |FROM k ORDER BY key_q9 DESC, doc_id LIMIT 50""".stripMargin,

    "d107_apportion" ->
      """WITH t AS (SELECT source, sum(len(string_split(text,' '))) AS tok FROM documents GROUP BY source),
        |tot AS (SELECT sum(tok) AS T FROM t),
        |base AS (SELECT source, tok, (1000 * tok) // T AS base, (1000 * tok) % T AS rem FROM t CROSS JOIN tot),
        |lr AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rr,
        |        (SELECT 1000 - sum(base) FROM base) AS leftover FROM base)
        |SELECT source, CAST(tok AS BIGINT) AS tokens, CAST(base AS BIGINT) AS base_alloc,
        |  CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM lr ORDER BY source""".stripMargin,

    "d108_waterfill" ->
      """WITH t AS (SELECT source, sum(len(string_split(text,' '))) AS avail FROM documents GROUP BY source),
        |tot AS (SELECT sum(avail) AS T, count(*) AS m FROM t),
        |o AS (SELECT source, avail, row_number() OVER (ORDER BY avail, source) AS k,
        |        sum(avail) OVER (ORDER BY avail, source ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk
        |      FROM t),
        |s AS (SELECT o.*, tot.T * 19 // 20 AS B, tot.m,
        |        (avail * (m - k + 1) + (pk - avail)) <= tot.T * 19 // 20 AS sat
        |      FROM o CROSS JOIN tot),
        |agg AS (SELECT max(CASE WHEN sat THEN k ELSE 0 END) AS kstar,
        |         max(CASE WHEN sat THEN pk ELSE 0 END) AS psat FROM s),
        |lvl AS (SELECT kstar, psat,
        |         ((SELECT B FROM s LIMIT 1) - psat) // ((SELECT m FROM s LIMIT 1) - kstar) AS base,
        |         ((SELECT B FROM s LIMIT 1) - psat) % ((SELECT m FROM s LIMIT 1) - kstar) AS extra
        |        FROM agg)
        |SELECT s.source, CAST(s.avail AS BIGINT) AS avail, s.sat AS saturated,
        |  CAST(CASE WHEN s.sat THEN s.avail
        |       ELSE lvl.base + CASE WHEN s.k - lvl.kstar <= lvl.extra THEN 1 ELSE 0 END END AS BIGINT) AS alloc
        |FROM s CROSS JOIN lvl ORDER BY source""".stripMargin,

    "d109_zipf_slope" ->
      """WITH t AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
        |c AS (SELECT w, count(*) AS c FROM t GROUP BY w),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM c ORDER BY c DESC, w LIMIT 200),
        |q AS (SELECT CAST(floor(ln(rn) * 1000.0) AS BIGINT) AS x, CAST(floor(ln(c) * 1000.0) AS BIGINT) AS y FROM r),
        |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx FROM q)
        |SELECT CAST(n AS BIGINT) AS n, CAST(sx AS BIGINT) AS sx_q3, CAST(sy AS BIGINT) AS sy_q3,
        |  CAST(-(((sx * sy - n * sxy) * 1000000) // (n * sxx - sx * sx)) AS BIGINT) AS slope_q6
        |FROM s""".stripMargin,

    "d110_trunc_budget" ->
      """WITH n AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
        |k AS (SELECT unnest([32, 64, 96]) AS cap)
        |SELECT CAST(cap AS BIGINT) AS cap,
        |  CAST(count(CASE WHEN n > cap THEN 1 END) AS BIGINT) AS docs_clipped,
        |  CAST(sum(CASE WHEN n > cap THEN n - cap ELSE 0 END) AS BIGINT) AS tokens_lost,
        |  CAST(sum(least(n, cap)) AS BIGINT) AS tokens_kept,
        |  CAST((CAST(sum(CASE WHEN n > cap THEN n - cap ELSE 0 END) AS HUGEINT) * 1000000) // sum(n) AS BIGINT) AS lost_frac_q6
        |FROM n CROSS JOIN k GROUP BY cap ORDER BY cap""".stripMargin,

    "d111_hash_collisions" ->
      """WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents WHERE len(string_split(text,' ')) >= 3),
        |sh AS (SELECT DISTINCT unnest([w[i]||' '||w[i+1]||' '||w[i+2] FOR i IN generate_series(1,len(w)-2)]) AS s FROM w),
        |h AS (SELECT s, CAST(('0x'||substr(md5(s),1,15)) AS BIGINT) AS h60,
        |        CAST(('0x'||substr(md5(s),1,5)) AS BIGINT) AS h20 FROM sh)
        |SELECT CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(DISTINCT h60) AS BIGINT) AS n_h60,
        |  CAST(count(DISTINCT h20) AS BIGINT) AS n_h20,
        |  CAST(count(*) - count(DISTINCT h60) AS BIGINT) AS coll_60,
        |  CAST(count(*) - count(DISTINCT h20) AS BIGINT) AS coll_20
        |FROM h""".stripMargin,

    "d112_rule_ablation" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |b AS (SELECT doc_id, len(w) AS n_words,
        |  list_reduce(list_prepend(0, [length(x) FOR x IN w]), (acc, el) -> acc + el) AS sum_wlen,
        |  len(list_intersect(list_distinct(w), ['the','a','of','and','to'])) AS stop_hits
        |FROM w),
        |k AS (SELECT doc_id, r.rule, r.killed FROM b, LATERAL (VALUES
        |  ('min_words', n_words < 50), ('max_words', n_words > 100000),
        |  ('min_wlen', 3 * n_words > sum_wlen), ('max_wlen', sum_wlen > 10 * n_words),
        |  ('stopwords', stop_hits < 2)) AS r(rule, killed))
        |SELECT x.rule AS rule_a, y.rule AS rule_b,
        |  CAST(count(CASE WHEN x.killed THEN 1 END) AS BIGINT) AS kill_a,
        |  CAST(count(CASE WHEN x.killed AND y.killed THEN 1 END) AS BIGINT) AS kill_both
        |FROM k x JOIN k y ON x.doc_id = y.doc_id AND x.rule <= y.rule
        |GROUP BY x.rule, y.rule ORDER BY rule_a, rule_b""".stripMargin,

    "d113_pack_order" ->
      """WITH RECURSIVE b AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok, doc_id % 8 AS shard FROM documents),
        |n1 AS (SELECT doc_id, n_tok, shard, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM b),
        |r1 AS (
        |  SELECT shard, rn, n_tok, n_tok AS fill, CAST(0 AS BIGINT) AS bin FROM n1 WHERE rn = 1
        |  UNION ALL
        |  SELECT n1.shard, n1.rn, n1.n_tok,
        |    CASE WHEN r1.fill + n1.n_tok <= 256 THEN r1.fill + n1.n_tok ELSE n1.n_tok END,
        |    CASE WHEN r1.fill + n1.n_tok <= 256 THEN r1.bin ELSE r1.bin + 1 END
        |  FROM r1 JOIN n1 ON n1.shard = r1.shard AND n1.rn = r1.rn + 1),
        |n2 AS (SELECT doc_id, n_tok, shard, row_number() OVER (PARTITION BY shard ORDER BY n_tok DESC, doc_id) AS rn FROM b),
        |r2 AS (
        |  SELECT shard, rn, n_tok, n_tok AS fill, CAST(0 AS BIGINT) AS bin FROM n2 WHERE rn = 1
        |  UNION ALL
        |  SELECT n2.shard, n2.rn, n2.n_tok,
        |    CASE WHEN r2.fill + n2.n_tok <= 256 THEN r2.fill + n2.n_tok ELSE n2.n_tok END,
        |    CASE WHEN r2.fill + n2.n_tok <= 256 THEN r2.bin ELSE r2.bin + 1 END
        |  FROM r2 JOIN n2 ON n2.shard = r2.shard AND n2.rn = r2.rn + 1),
        |t1 AS (SELECT shard, max(bin) + 1 AS nseq_arrival FROM r1 GROUP BY shard),
        |t2 AS (SELECT shard, max(bin) + 1 AS nseq_sorted FROM r2 GROUP BY shard),
        |tk AS (SELECT shard, sum(n_tok) AS tokens FROM b GROUP BY shard)
        |SELECT tk.shard, CAST(tk.tokens AS BIGINT) AS tokens,
        |  CAST(t1.nseq_arrival AS BIGINT) AS nseq_arrival,
        |  CAST(t2.nseq_sorted AS BIGINT) AS nseq_sorted
        |FROM tk JOIN t1 USING (shard) JOIN t2 USING (shard) ORDER BY shard""".stripMargin,

    "d114_centroid_sim" ->
      """WITH e AS (SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1000000.0) AS BIGINT) FOR x IN embedding] AS xq FROM embeddings),
        |j AS (SELECT d.source, e.xq FROM documents d JOIN e ON e.vec_id = d.doc_id),
        |x AS (SELECT source, i, sum(xq[i]) AS s, count(*) AS n
        |      FROM j CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) GROUP BY source, i),
        |c AS (SELECT source, i, CAST(floor(s * 1.0 / n) AS BIGINT) AS cq FROM x),
        |p AS (SELECT a.source AS src_a, b.source AS src_b, sum(a.cq * b.cq) AS dot
        |      FROM c a JOIN c b ON a.i = b.i AND a.source < b.source GROUP BY a.source, b.source),
        |nr AS (SELECT source, sum(cq * cq) AS n2 FROM c GROUP BY source)
        |SELECT p.src_a, p.src_b, CAST(p.dot AS BIGINT) AS dot,
        |  CAST(floor(CAST(p.dot AS DOUBLE) * 1000000.0 / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))) AS BIGINT) AS cos_q6
        |FROM p JOIN nr na ON na.source = p.src_a JOIN nr nb ON nb.source = p.src_b
        |ORDER BY src_a, src_b""".stripMargin,

    "d115_bloom_audit" ->
      """WITH w AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents WHERE len(string_split(text,' ')) >= 5),
        |g AS (SELECT DISTINCT source = 'src0' AS is_ref,
        |        w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4] AS s
        |      FROM w, LATERAL (SELECT unnest(generate_series(1, len(w)-4)) AS i) ix),
        |ref AS (SELECT DISTINCT s FROM g WHERE is_ref),
        |dump AS (SELECT DISTINCT s FROM g WHERE NOT is_ref),
        |ex AS (SELECT count(*) AS n_probe, count(r.s) AS exact_hits
        |       FROM dump LEFT JOIN ref r USING (s))
        |SELECT CAST(n_probe AS BIGINT) AS n_probe, CAST(exact_hits AS BIGINT) AS exact_hits,
        |  TRUE AS bloom_superset, TRUE AS fp_within_bound
        |FROM ex""".stripMargin
  )
}
