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
    val raw = options.getOrElse("minQuality", "0.5").toString
    val minQ = raw.toDoubleOption.getOrElse(
      throw PresetFactory.ConfigException(
        s"dataProcessor option 'minQuality' must be a number, got '$raw'"))
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
          case _: ClassNotFoundException | _: NoSuchFieldException =>
            try (Class.forName(clsName), null) // Java static
            catch {
              case _: ClassNotFoundException =>
                throw PresetFactory.ConfigException(
                  s"dataProcessor class '$clsName' not found")
            }
        }
      // an options param may be declared as any Map supertype our
      // immutable Map satisfies, or as java.util.Map (the natural
      // Java signature) — converted at call time
      def optsParam(t: Class[_]): Boolean =
        t.isAssignableFrom(classOf[Map[_, _]]) ||
          t.isAssignableFrom(classOf[java.util.Map[_, _]])
      val methods = clazz.getMethods.filter(_.getName == methodName)
      val withOpts = methods.find(m => m.getParameterCount == 2 &&
        m.getParameterTypes()(0).isAssignableFrom(classOf[org.apache.spark.sql.Dataset[_]]) &&
        optsParam(m.getParameterTypes()(1)))
      val plain = methods.find(m => m.getParameterCount == 1 &&
        m.getParameterTypes()(0).isAssignableFrom(classOf[org.apache.spark.sql.Dataset[_]]))
      val method = withOpts.orElse(plain).getOrElse(
        throw PresetFactory.ConfigException(
          s"dataProcessor '$spec' must be a method taking a DataFrame " +
            "(and optionally an options Map)"))
      // The reference instantiates the class and calls the method on
      // the instance (Preset.php:45, `[new $className, $methodName]`)
      // — mirror that: a non-static method with a public no-arg ctor
      // gets a fresh receiver at preset build. Only a class with NO
      // usable ctor fails (at build, not with an NPE mid-import).
      val receiver: AnyRef =
        if (target != null ||
            java.lang.reflect.Modifier.isStatic(method.getModifiers)) target
        else
          try clazz.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
          catch {
            case _: NoSuchMethodException | _: IllegalAccessException =>
              throw PresetFactory.ConfigException(
                s"dataProcessor '$spec' resolves to an INSTANCE method " +
                  "and the class has no public no-arg constructor — " +
                  "add one, or declare the method on a Scala object / " +
                  "as a Java static")
            case e: java.lang.reflect.InvocationTargetException =>
              throw PresetFactory.ConfigException(
                s"dataProcessor class '$clsName' constructor failed: " +
                  Option(e.getCause).getOrElse(e).toString)
          }
      if (!classOf[org.apache.spark.sql.Dataset[_]]
            .isAssignableFrom(method.getReturnType))
        // the reference's error contract (Preset.php:48)
        throw PresetFactory.ConfigException(
          s"The \"dataProcessor\" must return a DataFrame but " +
            s"'$spec' returns ${method.getReturnType.getSimpleName}")
      val wantsJavaMap = withOpts.exists(m =>
        m.getParameterTypes()(1).isAssignableFrom(classOf[java.util.Map[_, _]]) &&
          !m.getParameterTypes()(1).isAssignableFrom(classOf[Map[_, _]]))
      (df, options) =>
        try {
          val optArg: AnyRef =
            if (wantsJavaMap) {
              val jm = new java.util.HashMap[String, Any]()
              options.foreach { case (k, v) => jm.put(k, v) }
              jm
            } else options
          (if (withOpts.isDefined) method.invoke(receiver, df, optArg)
           else method.invoke(receiver, df)).asInstanceOf[DataFrame]
        } catch {
          // surface the processor's own failure, not the wrapper
          case e: java.lang.reflect.InvocationTargetException =>
            throw Option(e.getCause).getOrElse(e)
        }
    }
}
