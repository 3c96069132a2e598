package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Settings persistence — parity with the reference's
  * `persistence/settings.rs`: a flat JSON settings file in the user
  * config dir (`$XDG_CONFIG_HOME/graft/settings.json`, falling back to
  * `~/.config/graft`), same field set and defaults
  * (settings.rs:8-58,180-182: LOD thresholds, API bind/port/key, gRPC
  * port, autosave/export/log dir overrides, background-on-close).
  * Load tolerates missing keys (serde `#[serde(default)]` semantics);
  * save is atomic (tmp + rename, like persist.rs:100-131).
  */
case class AppSettings(
    autosaveOverride: Option[String] = None,
    exportOverride: Option[String] = None,
    apiLogOverride: Option[String] = None,
    lodEnabled: Boolean = true,
    lodLabelMinZoom: Double = 0.7,
    lodHideLabelsNodeThreshold: Int = 200,
    apiEnabled: Boolean = false,
    apiBindAddr: String = "127.0.0.1",
    apiPort: Int = 8787,
    apiKey: Option[String] = None,
    grpcEnabled: Boolean = false,
    grpcPort: Int = 50051,
    backgroundOnClose: Boolean = false,
    // engine extension (no reference counterpart): driver-side result
    // cap applied by the daemon as spark.graft.maxResultRows
    maxResultRows: Option[Long] = None) {

  def apiEndpoint: String = s"$apiBindAddr:$apiPort"

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def toJson: String = {
    def opt(o: Option[String]): String = o.map(jsonStr).getOrElse("null")
    s"""{
       |  "autosave_override": ${opt(autosaveOverride)},
       |  "export_override": ${opt(exportOverride)},
       |  "api_log_override": ${opt(apiLogOverride)},
       |  "lod_enabled": $lodEnabled,
       |  "lod_label_min_zoom": $lodLabelMinZoom,
       |  "lod_hide_labels_node_threshold": $lodHideLabelsNodeThreshold,
       |  "api_enabled": $apiEnabled,
       |  "api_bind_addr": ${jsonStr(apiBindAddr)},
       |  "api_port": $apiPort,
       |  "api_key": ${opt(apiKey)},
       |  "grpc_enabled": $grpcEnabled,
       |  "grpc_port": $grpcPort,
       |  "background_on_close": $backgroundOnClose,
       |  "max_result_rows": ${maxResultRows.map(_.toString).getOrElse("null")}
       |}""".stripMargin
  }
}

object AppSettings {

  /** `$XDG_CONFIG_HOME/graft` or `~/.config/graft` (the unix arm of
    * settings.rs:61-86's cross-platform config dir). */
  def configDir: Path =
    sys.env.get("XDG_CONFIG_HOME").map(Paths.get(_, "graft")).getOrElse(
      Paths.get(sys.env.getOrElse("HOME", "."), ".config", "graft"))

  def defaultPath: Path = configDir.resolve("settings.json")

  /** Load from `path` (default location otherwise); missing file or any
    * parse problem → defaults, missing keys → their defaults. */
  def load(path: Option[Path] = None): AppSettings = {
    val p = path.getOrElse(defaultPath)
    if (!Files.exists(p)) return AppSettings()
    try parse(Files.readString(p)) catch { case _: Exception => AppSettings() }
  }

  /** Atomic save: write tmp in the same dir, then rename over. */
  def save(s: AppSettings, path: Option[Path] = None): Path = {
    val p = path.getOrElse(defaultPath)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, s.toJson)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    p
  }

  /** Flat-JSON field extraction (the settings shape has no nesting). */
  private[graft] def parse(json: String): AppSettings = {
    // values may contain escapes that save() itself produces (quotes,
    // backslashes in paths) — match them and unescape, so save→load
    // round-trips instead of silently dropping to defaults
    def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'u' if i + 5 < s.length =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case other => sb.append(other); i += 2
          }
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    def str(key: String): Option[String] =
      (("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r)
        .findFirstMatchIn(json).map(m => unescape(m.group(1)))
    def num(key: String): Option[Double] =
      (("\"" + key + "\"\\s*:\\s*(-?[0-9.eE+\\-]+)").r)
        .findFirstMatchIn(json).map(_.group(1).toDouble)
    def bool(key: String): Option[Boolean] =
      (("\"" + key + "\"\\s*:\\s*(true|false)").r)
        .findFirstMatchIn(json).map(_.group(1) == "true")
    val d = AppSettings()
    AppSettings(
      autosaveOverride = str("autosave_override"),
      exportOverride = str("export_override"),
      apiLogOverride = str("api_log_override"),
      lodEnabled = bool("lod_enabled").getOrElse(d.lodEnabled),
      lodLabelMinZoom = num("lod_label_min_zoom").getOrElse(d.lodLabelMinZoom),
      lodHideLabelsNodeThreshold =
        num("lod_hide_labels_node_threshold").map(_.toInt).getOrElse(d.lodHideLabelsNodeThreshold),
      apiEnabled = bool("api_enabled").getOrElse(d.apiEnabled),
      apiBindAddr = str("api_bind_addr").getOrElse(d.apiBindAddr),
      apiPort = num("api_port").map(_.toInt).getOrElse(d.apiPort),
      apiKey = str("api_key"),
      grpcEnabled = bool("grpc_enabled").getOrElse(d.grpcEnabled),
      grpcPort = num("grpc_port").map(_.toInt).getOrElse(d.grpcPort),
      backgroundOnClose = bool("background_on_close").getOrElse(d.backgroundOnClose),
      maxResultRows = num("max_result_rows").map(_.toLong))
  }
}
