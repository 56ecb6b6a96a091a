package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Declaratively-configured dataProcessors — the reference resolves
 * `options.dataProcessor` as a `ClassName::methodName` string to a
 * callable `(DataRecords, options) => DataRecords`
 * (Classes/Preset.php:44-50); presets configured in settings files
 * get their transform hook by NAME, not by code. The Spark mirror:
 *
 *  - a registry of named processors `(DataFrame, options) =>
 *    DataFrame` (the idiomatic route — ships with schema-preserving
 *    wrappers over the ext operators so the LLM-pipeline tier is
 *    reachable from a plain presets file);
 *  - `ClassName::methodName` reflection for user code, mirroring the
 *    reference's contract: the method takes the records frame (and
 *    optionally the options map) and must return a DataFrame —
 *    anything else fails with the reference's error shape
 *    (Preset.php:48).
 *
 * Processors run AFTER keying and BEFORE the diff (Preset.load), so
 * they see `__id`/`__version` plus raw attributes and must keep the
 * keyed-record shape (rewriting ids is allowed — the pipeline
 * re-dedups, DataRecordsTest.php:48-57).
 */
object Processors {

  type Processor = (DataFrame, Map[String, Any]) => DataFrame

  private val registry =
    new scala.collection.concurrent.TrieMap[String, Processor]()

  def register(name: String, f: Processor): Unit = registry.put(name, f)

  private def textCol(options: Map[String, Any]): String =
    options.getOrElse("textAttribute", "text").toString

  // Built-ins: schema-preserving bridges into the ext tier.
  register("scrub_text", (df, options) => {
    val c = textCol(options)
    df.withColumn(c, graft.ext.TextAnalysis.piiScrubText(col(c)))
  })
  register("filter_quality", (df, options) => {
    val minQ = options.getOrElse("minQuality", "0.5").toString.toDouble
    df.filter(graft.ext.TextAnalysis.qualityScore(col(textCol(options))) >= minQ)
  })
  register("filter_lang", (df, options) => {
    val lang = options.getOrElse("lang", "en").toString
    df.filter(graft.ext.TextAnalysis.langId(col(textCol(options))) === lang)
  })

  /** Resolve a processor spec: registry name first, then
    * `ClassName::methodName` reflection (Scala `object` or Java
    * static). Unknown spec / wrong shape ⇒ ConfigException. */
  def resolve(spec: String): Processor =
    registry.get(spec).getOrElse {
      if (!spec.contains("::"))
        throw PresetFactory.ConfigException(
          s"Unknown dataProcessor '$spec' (not a registered name, and " +
            "not a 'ClassName::methodName' reference)")
      val Array(clsName, methodName) = spec.split("::", 2)
      val (clazz, target) =
        try {
          val c = Class.forName(clsName + "$") // Scala object
          (c, c.getField("MODULE$").get(null))
        } catch {
          case _: ClassNotFoundException =>
            try (Class.forName(clsName), null) // Java static
            catch {
              case _: ClassNotFoundException =>
                throw PresetFactory.ConfigException(
                  s"dataProcessor class '$clsName' not found")
            }
        }
      val methods = clazz.getMethods.filter(_.getName == methodName)
      val withOpts = methods.find(m => m.getParameterCount == 2 &&
        classOf[DataFrame].isAssignableFrom(m.getParameterTypes()(0)) &&
        classOf[Map[_, _]].isAssignableFrom(m.getParameterTypes()(1)))
      val plain = methods.find(m => m.getParameterCount == 1 &&
        classOf[DataFrame].isAssignableFrom(m.getParameterTypes()(0)))
      val method = withOpts.orElse(plain).getOrElse(
        throw PresetFactory.ConfigException(
          s"dataProcessor '$spec' must be a method taking a DataFrame " +
            "(and optionally an options Map)"))
      if (!classOf[DataFrame].isAssignableFrom(method.getReturnType))
        // the reference's error contract (Preset.php:48)
        throw PresetFactory.ConfigException(
          s"The \"dataProcessor\" must return a DataFrame but " +
            s"'$spec' returns ${method.getReturnType.getSimpleName}")
      (df, options) =>
        (if (withOpts.isDefined) method.invoke(target, df, options)
         else method.invoke(target, df)).asInstanceOf[DataFrame]
    }
}
