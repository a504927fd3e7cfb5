package bvgraph

/** Fallback resolution path for `spark.read.format("bvgraph")`.
  *
  * The primary registration is the `DataSourceRegister` service file
  * (`META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`),
  * which Spark's `ServiceLoader` scan picks up when resources are on the
  * classpath. But a bare `sbt compile` does NOT copy resources into
  * `target/scala-2.13/classes`, so any harness that runs against the raw
  * classes directory (rather than a packaged jar or sbt's runtime
  * classpath) would fail short-name lookup with DATA_SOURCE_NOT_FOUND.
  * Spark's `DataSource.lookupDataSource` falls back to loading the class
  * `<name>.DefaultSource` — this class IS that fallback, so the short name
  * resolves from compiled classes alone.
  */
class DefaultSource extends graft.sources.BvGraphTableProvider
