package graft.cli

import graft.pipeline._
import org.apache.spark.sql.SparkSession

/**
 * CLI verbs (reference: Classes/Command/ImportCommandController.php):
 * `run`, `prune`, `presets`, `preset`, `setup` with `--force-updates`,
 * `--from-fixture`, `--assume-yes`, `--quiet`, and JSON-ish option
 * overrides (`--override-source-options k=v,k=v`).
 *
 * Preset definitions load from a simple properties file (the YAML
 * settings layer of the reference is a Flow-framework concern; the
 * template/override semantics live in PresetFactory and are fully
 * exercised here and in tests).
 */
object Main {

  /** Split on `sep` at quote depth 0 — `'...'`/`"..."` protect
    * separators and `=`; `\` escapes inside quotes. A quote only
    * OPENS at the start of a field or right after `=` (an interior
    * apostrophe — `name=O'Brien` — is plain data, not quoting).
    * Unterminated quotes fail loudly rather than silently swallowing
    * the rest of the argument. */
  private[graft] def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0; var escaped = false
    s.foreach { ch =>
      if (escaped) { cur += ch; escaped = false }
      else if (quote != 0 && ch == '\\') { cur += ch; escaped = true }
      else if (quote != 0) { cur += ch; if (ch == quote) quote = 0 }
      else if ((ch == '\'' || ch == '"') &&
               (cur.isEmpty || cur.last == '=')) { cur += ch; quote = ch }
      else if (ch == sep) { out += cur.result(); cur.clear() }
      else cur += ch
    }
    if (quote != 0) throw new IllegalArgumentException(
      s"unterminated $quote-quote in option value: $s")
    out += cur.result()
    out.result()
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && (t.head == '\'' || t.head == '"') && t.last == t.head)
      t.substring(1, t.length - 1)
        .replace("\\" + t.head, t.head.toString).replace("\\\\", "\\")
    else t
  }

  /** `k=v,k=v` option overrides. Values may be single- or
    * double-quoted to carry `,` and `=` (e.g.
    * `--override-source-options 'url="jdbc:db;a=1,b=2"'`) — the
    * unquoted form chokes on exactly the values JDBC URLs and HTTP
    * headers are made of. */
  private[graft] def parseKv(s: String): Map[String, Any] =
    splitTop(s, ',').map(_.trim).filter(_.nonEmpty).map { kv =>
      splitTop(kv, '=') match {
        case Seq(k) => k.trim -> ("": Any)
        case parts => parts.head.trim -> (unquote(
          parts.tail.mkString("=")): Any)
      }
    }.toMap

  def parsePresetFile(path: String): Map[String, PresetConfig] = {
    // minimal line format: presetName.key = value  (see tests)
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    lines.groupBy(_.takeWhile(_ != '.')).map { case (name, ls) =>
      val kv = ls.map { l =>
        val Array(k, v) = l.split("=", 2).map(_.trim)
        k.drop(name.length + 1) -> v
      }.toMap
      def sub(prefix: String): Map[String, Any] = {
        val opts = kv.collect {
          case (k, v) if k.startsWith(s"$prefix.options.") =>
            k.drop(prefix.length + 9) -> (v: Any)
        }
        Map("type" -> kv.getOrElse(s"$prefix.type", "file"),
          "options" -> opts)
      }
      name -> PresetConfig(
        template = kv.get("template"),
        source = sub("source"),
        target = sub("target"),
        mapping = kv.collect {
          case (k, v) if k.startsWith("mapping.") => k.drop(8) -> v
        }.toSeq,
        dataProcessor = kv.get("dataProcessor"),
        // one key family: `dataProcessor = name` +
        // `dataProcessor.options.k = v` (a `processor.options.` typo
        // would otherwise be swallowed silently)
        processorOptions = kv.collect {
          case (k, v) if k.startsWith("dataProcessor.options.") =>
            k.stripPrefix("dataProcessor.options.") -> (v: Any)
        }.toMap,
        idAttribute = kv.getOrElse("idAttribute", "id"),
        versionAttribute = kv.get("versionAttribute"),
        skipAddedRecords = kv.get("skipAddedRecords").contains("true"),
        skipRemovedRecords = kv.get("skipRemovedRecords").contains("true"))
    }
  }

  def main(args: Array[String]): Unit = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    val flagMap = flags.map { f =>
      f.stripPrefix("--").split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "true"
      }
    }.toMap
    val quiet = flagMap.contains("quiet")
    def info(msg: String): Unit = if (!quiet) println(msg)

    positional.toList match {
      case verb :: rest =>
        val presetsFile = flagMap.getOrElse("presets-file", "presets.conf")
        lazy val presets = parsePresetFile(presetsFile)
        lazy val spark = graft.util.Tables.session("graft-cli",
          flagMap.getOrElse("cpus", "4"))
        verb match {
          case "presets" => // ImportCommandController.php:99
            presets.keys.toSeq.sorted.foreach(println)
          case "preset" => // `:122`
            val name = rest.headOption.getOrElse(sys.error("preset name required"))
            println(presets(name))
          case "run" => // `:43`
            val name = rest.headOption.getOrElse(sys.error("preset name required"))
            val preset = PresetFactory.create(presets, name,
              overrideSource = flagMap.get("override-source-options")
                .map(parseKv).getOrElse(Map.empty),
              overrideTarget = flagMap.get("override-target-options")
                .map(parseKv).getOrElse(Map.empty),
              fixturePath = flagMap.get("from-fixture"))
            val svc = new ImportService(preset)
            if (!quiet) svc.on((e, payload) => info(s"[$e] $payload"))
            val r = svc.importData(spark, flagMap.contains("force-updates"))
            info(s"Import of preset '$name' finished: " +
              s"added=${r.added} updated=${r.updated} removed=${r.removed} " +
              s"errors=${r.errors}")
          case "prune" => // `:72` (confirmation unless --assume-yes)
            val name = rest.headOption.getOrElse(sys.error("preset name required"))
            if (!flagMap.contains("assume-yes")) {
              print(s"Remove all local records for preset '$name'? [y/N] ")
              if (!scala.io.StdIn.readLine().trim.equalsIgnoreCase("y")) {
                info("Aborted."); return
              }
            }
            val preset = PresetFactory.create(presets, name)
            val n = new ImportService(preset).removeAllData(spark)
            info(s"Removed $n local records.")
          case "setup" => // `:156`
            val name = rest.headOption.getOrElse(sys.error("preset name required"))
            val preset = PresetFactory.create(presets, name)
            val r = new ImportService(preset).setup(spark)
            r.errors.foreach(e => println(s"ERROR: $e"))
            r.warnings.foreach(w => println(s"WARNING: $w"))
            if (!r.ok || r.warnings.nonEmpty) sys.exit(1)
            info("Setup OK.")
          case other => sys.error(s"Unknown verb '$other'")
        }
      case Nil =>
        println("usage: graft.cli.Main <run|prune|presets|preset|setup> " +
          "<preset> [--presets-file=F] [--force-updates] [--from-fixture=PATH] " +
          "[--assume-yes] [--quiet] [--override-source-options k=v,...]")
    }
  }
}
