package graft.operators

import graft.functions.RatcliffObershelp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Faithful re-implementation of the reference's driver-side greedy
  * clustering (A4, /root/reference/solutionTwo.py:37-78): collect all rows,
  * then in arrival order either join every existing cluster whose KEY is
  * > 80 similar to the row's name, or seed a new cluster keyed by the name.
  *
  * Preserved quirks (SURVEY §4 bug 3 — these are the semantics, not bugs to
  * fix silently):
  *  - strict `> 80` (vs `>= 80` in soulutionOne's join);
  *  - similarity is measured against the cluster KEY only, so clustering is
  *    NOT transitive — a row that bridges two clusters joins both, the
  *    clusters never merge;
  *  - a row similar to several keys is added to ALL of them (multi-assign);
  *  - order-dependent: the first occurrence of a name becomes a key.
  *
  * Determinism management (SURVEY §7.4): the reference iterates `collect()`
  * in undefined partition order and stringifies Python sets (arbitrary
  * order); here the caller supplies an explicit `orderCol` total order and
  * member sets are emitted sorted. CPython-dict iteration order = insertion
  * order is preserved by LinkedHashMap.
  *
  * This operator is driver-side BY DEFINITION — its semantics are a
  * sequential fold. It exists for reference parity on counterparty-sized
  * data; the distributed, order-free equivalent for 100 TB is
  * [[ConnectedComponents]] over a similarity-join edge list.
  */
object GreedyCluster {

  private final class Cluster {
    val names = mutable.TreeSet.empty[String]
    val alts = mutable.TreeSet.empty[String]
  }

  /** Returns (name = cluster key, names = sorted member names joined by ",",
    * alts = sorted member alts joined by ",").
    */
  def cluster(df: DataFrame, nameCol: String, altCol: String,
              orderCol: String, threshold: Double = 80.0,
              maxRows: Long = 1000000L): DataFrame = {
    val spark = df.sparkSession
    // Fail fast instead of OOMing the driver: this operator is sequential
    // by definition; at corpus scale use ConnectedComponents instead.
    val n = df.count()
    require(n <= maxRows,
      s"GreedyCluster collects to the driver ($n rows > limit $maxRows); " +
        "use ConnectedComponents over a similarity join for large inputs")
    val rows: Array[Row] = df
      .select(col(nameCol).cast("string"), col(altCol).cast("string"))
      .orderBy(col(orderCol))
      .collect()

    val clusters = mutable.LinkedHashMap.empty[String, Cluster]
    rows.foreach { r =>
      val name = r.getString(0)
      val alt = r.getString(1)
      var added = false
      if (clusters.isEmpty) {
        val c = new Cluster; c.names += name; c.alts += alt
        clusters(name) = c
        added = true
      } else {
        clusters.foreach { case (key, c) =>
          if (RatcliffObershelp.similarity(key, name) > threshold) {
            c.names += name; c.alts += alt
            added = true
          }
        }
      }
      if (!added) {
        val c = new Cluster; c.names += name; c.alts += alt
        clusters(name) = c
      }
    }

    import spark.implicits._
    clusters.iterator
      .map { case (k, c) => (k, c.names.mkString(","), c.alts.mkString(",")) }
      .toSeq.toDF("name", "names", "alts")
  }
}
