package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.GraftCatalog

/**
 * End-to-end gates for the SQL STRING surface — the first thing a real
 * user touches: [[GraftCatalog.registerAll]] (temp views + the engine's
 * registered SQL functions) followed by plain `spark.sql` text. Nothing
 * here goes through the Column API; if function registration, parsing,
 * or resolution of `zorder`/`zorder_x`/`zorder_y`/`simhash_agg` breaks,
 * these queries break.
 */
object SqlQueries {

  private def sql(s: SparkSession, dir: String, text: String): DataFrame = {
    GraftCatalog.registerAll(s, dir)
    s.sql(text)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the range_count rectangle, expressed purely in SQL text. The
    // zorder/zorder_x/zorder_y roundtrip predicates are identities over
    // in-domain points, so the result equals the plain rectangle count —
    // unless the SQL-registered codec is broken, which is the gate.
    "sql_range_count" -> ((s, dir) => sql(s, dir,
      """SELECT event_type, count(*) AS cnt
FROM (SELECT event_type,
             cast(floor(value*100) as int) AS x,
             cast(user_id as int) AS y,
             zorder(cast(floor(value*100) as int), cast(user_id as int)) AS zkey
      FROM events)
WHERE x BETWEEN 10000 AND 30000 AND y BETWEEN 40 AND 110
  AND zorder_x(zkey) = x AND zorder_y(zkey) = y
GROUP BY event_type""")),

    // the SimHash sketch through the SQL parser path: exercises the
    // registered simhash_agg aggregate — must hash-match the Column-API
    // twin (`simhash`) against the same relational oracle.
    "sql_simhash" -> ((s, dir) => sql(s, dir,
      """SELECT doc_id,
       simhash_agg(cast(conv(substr(md5(concat('0:', w)), 1, 15), 16, 10) as bigint)) AS simhash
FROM (SELECT doc_id, explode(array_distinct(split(lower(trim(text)), '\\s+'))) AS w
      FROM documents)
GROUP BY doc_id"""))
  )

  val oracle: Map[String, String] = Map(
    "sql_range_count" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
FROM events
WHERE CAST(floor(value*100) AS INT) BETWEEN 10000 AND 30000
  AND user_id BETWEEN 40 AND 110
GROUP BY event_type""",
    // identical pipeline to the Column-API `simhash` gate
    "sql_simhash" -> TextQueries.oracle("simhash")
  )
}
