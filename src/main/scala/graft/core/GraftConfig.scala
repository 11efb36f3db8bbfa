package graft.core

/** The reference's full configuration surface: 10 CLI knobs on
  * `Options extends PipelineOptions` (`HanaToBQ.java:175-224`, `README:22-34`).
  *
  * Same surface as a typed config. `endTime` is declared-but-dead in the
  * reference (never read in `main()` — `HanaToBQ.java:216-218`, SURVEY.md §1.3);
  * kept here for API parity and actually honored when set (strict improvement,
  * documented divergence).
  */
final case class GraftConfig(
    tableName: String,                       // HanaToBQ.java:176-179 (required)
    connectionString: String = "",           // :181-184 (required for JDBC)
    username: String = "",                   // :186-189
    password: String = "",                   // :191-194
    driver: String = "com.sap.db.jdbc.Driver", // :196-199 (default)
    destDataset: String = "",                // :201-204
    timestampColumn: String,                 // :206-209 (required)
    startTime: Long,                         // :211-214 (required, inclusive)
    endTime: Option[Long] = None,            // :216-218 (dead in ref; honored here)
    chunkSize: Long = 1000000L,              // :220-223 (default 1,000,000)
) {
  /** End-of-time sentinel closing the last chunk (`HanaToBQ.java:166`). */
  def effectiveEnd: Long = endTime.getOrElse(GraftConfig.Sentinel)
}

object GraftConfig {
  /** epoch 2000000000 ~ 2033-05-18 (`HanaToBQ.java:166`). */
  val Sentinel: Long = 2000000000L
}
