package graft.config

/** Engine configuration, mirroring the reference's 13-option CLI surface
  * (whiteRRabbit.R:29-83) plus engine-level additions for reproducibility
  * and 100 TB operation.
  *
  * Reference option → field mapping:
  *   --working_folder  → workingFolder   (whiteRRabbit.R:30-33)
  *   --delimiter       → delimiter       (whiteRRabbit.R:34-37)
  *   --output_dir      → outputDir       (whiteRRabbit.R:38-41)
  *   --output_format   → outputFormat    (whiteRRabbit.R:42-46)
  *   --maxRows         → maxRows         (whiteRRabbit.R:47-50; -1 = all)
  *   --maxDistinctValues → maxDistinctValues (whiteRRabbit.R:51-54)
  *   --prefix          → prefix          (whiteRRabbit.R:55-58)
  *   --cpus            → cpus            (whiteRRabbit.R:59-62)
  *   --exclude_cols    → excludeCols     (whiteRRabbit.R:63-66)
  *   --shift_dates     → shiftDates      (whiteRRabbit.R:67-70)
  *   --scan_field_values → scanFieldValues (whiteRRabbit.R:71-74)
  *   --min_cell_count  → minCellCount    (whiteRRabbit.R:75-78)
  *   --random_sample   → randomSample    (whiteRRabbit.R:79-82)
  *
  * Engine additions (not in the reference):
  *   - seed: the reference's sampling and date shift are unseeded
  *     (whiteRRabbit.R:252, :288); a fixed seed makes runs reproducible
  *     and oracle-checkable.
  *   - exactQuantiles: the reference computes exact quantiles in memory
  *     (whiteRRabbit.R:365-372). The exact default computes type-7
  *     quantiles from the per-column value histogram (no value
  *     buffering — Profile.histogramStats); exactQuantiles=false
  *     switches to `percentile_approx` sketches, whose state stays
  *     constant-size even for columns whose histogram would approach
  *     the row count.
  */
final case class ScanConfig(
    workingFolder: String = ".",
    delimiter: String = "tab",
    outputDir: String = ".",
    outputFormat: String = "xlsx", // reference default, whiteRRabbit.R:43-44
    maxRows: Long = 100000L,
    maxDistinctValues: Int = 1000,
    prefix: String = "ScanReport",
    cpus: Int = 1,
    excludeCols: Seq[String] = Nil,
    shiftDates: Boolean = false,
    scanFieldValues: Boolean = true,
    minCellCount: Long = 5L,
    randomSample: Boolean = true,
    seed: Long = 42L,
    exactQuantiles: Boolean = true,
    // percentile_approx accuracy: 1000 ≈ ±0.1% rank error. The sketch
    // gets MORE expensive to update than exact percentile at high
    // accuracy (measured 45s vs 11s at sf0.1 with accuracy=10000);
    // 1000 keeps the approx path strictly cheaper.
    quantileAccuracy: Int = 1000
) {
  /** Field separator implied by the delimiter choice (whiteRRabbit.R:110-116). */
  def sep: String = if (delimiter == "tab") "\t" else ","

  /** File glob implied by the delimiter choice (whiteRRabbit.R:111-115). */
  def filePattern: String = if (delimiter == "tab") "*.tsv" else "*.csv"
}
