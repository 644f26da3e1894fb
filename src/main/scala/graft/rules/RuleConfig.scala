package graft.rules

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * Declarative rule-set configuration: load a [[RuleSet]] from JSON and
 * export one back, so operators define/adjust constraint rules WITHOUT
 * recompiling the engine — the reference's per-check behavior is likewise
 * data-driven (flagship/study configuration in DynamoDB + manifest rows,
 * reference lambdas/layers/util/util/dynamodb.py:239-275,
 * submission_data.py:89-250), not code-edited per submission.
 *
 * Row-rule predicates are Spark SQL expression strings compiled by the
 * Catalyst parser at load time — they run codegen'd in the same single
 * fact-table scan as built-in rules, so a config-loaded rule costs exactly
 * what a compiled-in rule costs at any scale. Parse errors surface at LOAD
 * time with the offending rule id, never mid-run.
 *
 * Checkpoint lineage works unchanged: [[RuleSet.rulesetHash]] hashes the
 * loaded rules' descriptors, so editing the JSON invalidates prior
 * checkpoints exactly like editing compiled rules (reference re-validation
 * reset, validation_manager.py:224-253).
 *
 * JSON shape (see [[toJson]] for the exporter that prints it):
 * {{{
 * {"rules": [
 *   {"type": "row", "id": "R_NTOK_CAP", "severity": "error",
 *    "valid": "n_tok <= 8192", "observed": "to_json(struct(n_tok))"},
 *   {"type": "unique", "id": "R_UNIQUE_DOC_ID", "severity": "error",
 *    "key": "doc_id"},
 *   {"type": "cross_run_unique", "id": "R_CROSS_RUN", "severity": "error",
 *    "key": "doc_id"},
 *   {"type": "ref_integrity", "id": "R_REF", "severity": "error"},
 *   {"type": "stats", "id": "R_STATS", "severity": "error"},
 *   {"type": "manifest", "id": "R_MANIFEST", "severity": "error"},
 *   {"type": "storage_count", "id": "R_COUNT", "severity": "error"},
 *   {"type": "snapshot_equality", "id": "R_SNAP", "severity": "error"},
 *   {"type": "drift", "id": "R_DRIFT", "severity": "error",
 *    "kind": "ntok_hist", "test": "ks", "alpha": 0.01}
 * ]}
 * }}}
 */
object RuleConfig {

  /** Parse a rule set from a JSON string. Fails fast (with the rule id in
    * the message) on: unknown rule type, missing/ill-typed fields, invalid
    * severity, duplicate ids, unparseable SQL expressions, unknown drift
    * kind/test, and an empty rule list. */
  def fromJson(json: String): RuleSet = {
    val root =
      try JsonMethods.parse(json)
      catch {
        case e: Exception =>
          fail(s"rule config is not valid JSON: ${e.getMessage}")
      }
    val ruleVals = root \ "rules" match {
      case JArray(xs) => xs
      case JNothing => fail("rule config is missing the \"rules\" array")
      case other => fail(s"\"rules\" must be an array, got ${kind(other)}")
    }
    if (ruleVals.isEmpty) fail("rule config has an empty \"rules\" array")
    val rules = ruleVals.zipWithIndex.map { case (jv, i) => parseRule(jv, i) }
    val dupIds = rules.groupBy(_.id).collect {
      case (id, rs) if rs.size > 1 => id
    }
    if (dupIds.nonEmpty)
      fail(s"duplicate rule ids: ${dupIds.toSeq.sorted.mkString(", ")}")
    RuleSet(rules)
  }

  /** [[fromJson]] over a local file path (driver-side config read — rule
    * configs are a few KB; they ride spark-submit --files in a cluster). */
  def fromJsonFile(path: String): RuleSet =
    fromJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Export a rule set as config JSON — `fromJson(toJson(rs))` evaluates
    * identically to `rs` (row-rule Columns are rendered back to SQL via
    * Catalyst's `Expression.sql`). Lets a user start from the compiled-in
    * [[Rules.standard]] set (`cli.Main rules`) and edit, instead of
    * writing a config from scratch. */
  def toJson(rs: RuleSet): String = {
    val items = rs.rules.map {
      case RowRule(id, sev, valid, observed) =>
        obj("row", id, sev,
          "valid" -> JString(sqlOf(valid)),
          "observed" -> JString(sqlOf(observed)))
      case UniqueRule(id, sev, key) =>
        obj("unique", id, sev, "key" -> JString(key))
      case CrossRunUniqueRule(id, sev, key) =>
        obj("cross_run_unique", id, sev, "key" -> JString(key))
      case RefIntegrityRule(id, sev) => obj("ref_integrity", id, sev)
      case StatsRule(id, sev) => obj("stats", id, sev)
      case ManifestRule(id, sev) => obj("manifest", id, sev)
      case StorageCountRule(id, sev) => obj("storage_count", id, sev)
      case SnapshotEqualityRule(id, sev) => obj("snapshot_equality", id, sev)
      case DriftRule(id, sev, kindS, test, alpha) =>
        obj("drift", id, sev,
          "kind" -> JString(kindS), "test" -> JString(test),
          "alpha" -> JDouble(alpha))
      case EntropyRule(id, sev, kindS, minBits) =>
        obj("entropy", id, sev,
          "kind" -> JString(kindS), "min_bits" -> JDouble(minBits))
    }
    JsonMethods.pretty(JsonMethods.render(
      JObject("rules" -> JArray(items.toList))))
  }

  /** Render a rule Column back to SQL. Columns built with the Scala DSL
    * convert to UnresolvedFunction calls (`and(a, b)`, `` `=`(a, b) ``)
    * whose `.sql` is prefix-style — legal to re-parse but hostile to
    * hand-editing, which is this file's whole purpose — so known operators
    * are first mapped onto their Catalyst forms, whose `.sql` renders
    * infix (`(a AND b)`, `(a = b)`). The rendering is a FIXPOINT across
    * parse→render cycles, which is why [[RowRule.descriptor]] hashes this
    * form: a rule loaded from an exported config fingerprints identically
    * to its compiled-in original, so rule-delta revalidation sees a
    * compiled→config migration as zero changed rules. */
  private[rules] def sqlOf(c: org.apache.spark.sql.Column): String = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    import org.apache.spark.sql.catalyst.expressions._
    val binOps: Map[String, (Expression, Expression) => Expression] = Map(
      "and" -> ((a, b) => And(a, b)), "or" -> ((a, b) => Or(a, b)),
      "=" -> ((a, b) => EqualTo(a, b)), "==" -> ((a, b) => EqualTo(a, b)),
      "<=>" -> ((a, b) => EqualNullSafe(a, b)),
      ">" -> ((a, b) => GreaterThan(a, b)),
      ">=" -> ((a, b) => GreaterThanOrEqual(a, b)),
      "<" -> ((a, b) => LessThan(a, b)),
      "<=" -> ((a, b) => LessThanOrEqual(a, b)),
      "+" -> ((a, b) => Add(a, b)), "-" -> ((a, b) => Subtract(a, b)),
      "*" -> ((a, b) => Multiply(a, b)), "/" -> ((a, b) => Divide(a, b)),
      "%" -> ((a, b) => Remainder(a, b)))
    val infix = org.apache.spark.sql.GraftColumnBridge.resolvedExpression(c)
      .transformUp {
        case f: UnresolvedFunction
            if f.nameParts.length == 1 && f.arguments.length == 2 &&
              !f.isDistinct && f.filter.isEmpty &&
              binOps.contains(f.nameParts.head.toLowerCase) =>
          binOps(f.nameParts.head.toLowerCase)(
            f.arguments.head, f.arguments(1))
        case f: UnresolvedFunction
            if f.nameParts.map(_.toLowerCase) == Seq("not") &&
              f.arguments.length == 1 && !f.isDistinct && f.filter.isEmpty =>
          Not(f.arguments.head)
      }
    infix.sql
  }

  private def obj(tpe: String, id: String, sev: String,
      extra: (String, JValue)*): JObject =
    JObject(List[(String, JValue)](
      "type" -> JString(tpe), "id" -> JString(id),
      "severity" -> JString(sev)) ++ extra)

  private val driftKinds = Set("ntok_hist", "token_hist")
  private val driftTests = Set("ks", "chi2", "psi")

  private def parseRule(jv: JValue, idx: Int): RuleSpec = {
    val id = str(jv, "id", s"rules[$idx]")
    val where = s"rule \"$id\""
    val sev = str(jv, "severity", where) match {
      case s @ (graft.model.Severity.Error | graft.model.Severity.Warning) =>
        s
      case other =>
        fail(s"$where: severity must be \"error\" or \"warning\", " +
          s"got \"$other\"")
    }
    str(jv, "type", where) match {
      case "row" =>
        RowRule(id, sev,
          valid = parseExpr(str(jv, "valid", where), where, "valid"),
          observed = parseExpr(str(jv, "observed", where), where,
            "observed"))
      case "unique" => UniqueRule(id, sev, str(jv, "key", where))
      case "cross_run_unique" =>
        CrossRunUniqueRule(id, sev, str(jv, "key", where))
      case "ref_integrity" => RefIntegrityRule(id, sev)
      case "stats" => StatsRule(id, sev)
      case "manifest" => ManifestRule(id, sev)
      case "storage_count" => StorageCountRule(id, sev)
      case "snapshot_equality" => SnapshotEqualityRule(id, sev)
      case "drift" =>
        val kindS = str(jv, "kind", where)
        if (!driftKinds(kindS))
          fail(s"$where: drift kind must be one of " +
            s"${driftKinds.toSeq.sorted.mkString(", ")}; got \"$kindS\"")
        val test = str(jv, "test", where)
        if (!driftTests(test))
          fail(s"$where: drift test must be one of " +
            s"${driftTests.toSeq.sorted.mkString(", ")}; got \"$test\"")
        val alpha = jv \ "alpha" match {
          case JDouble(d) => d
          case JInt(n) => n.toDouble
          case JDecimal(d) => d.toDouble
          case JNothing => 0.01
          case other =>
            fail(s"$where: alpha must be a number, got ${kind(other)}")
        }
        DriftRule(id, sev, kindS, test, alpha)
      case "entropy" =>
        val kindS = str(jv, "kind", where)
        if (!driftKinds(kindS))
          fail(s"$where: entropy kind must be one of " +
            s"${driftKinds.toSeq.sorted.mkString(", ")}; got \"$kindS\"")
        val minBits = jv \ "min_bits" match {
          case JDouble(d) => d
          case JInt(n) => n.toDouble
          case JDecimal(d) => d.toDouble
          case JNothing => 1.0
          case other =>
            fail(s"$where: min_bits must be a number, got ${kind(other)}")
        }
        EntropyRule(id, sev, kindS, minBits)
      case other => fail(s"$where: unknown rule type \"$other\"")
    }
  }

  /** Compile a SQL expression string through the Catalyst parser —
    * syntax errors surface here, at config-load time, attributed to the
    * rule (`functions.expr` alone would DEFER parsing to first use);
    * analysis errors (unknown columns) surface at job planning, as for
    * compiled-in rules. */
  private def parseExpr(sql: String, where: String,
      field: String): org.apache.spark.sql.Column =
    try org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(sql))
    catch {
      case e: Exception =>
        fail(s"$where: cannot parse \"$field\" SQL " +
          s"expression: ${e.getMessage}")
    }

  private def str(jv: JValue, field: String, where: String): String =
    jv \ field match {
      case JString(s) if s.nonEmpty => s
      case JString(_) => fail(s"$where: \"$field\" must be non-empty")
      case JNothing => fail(s"$where: missing required field \"$field\"")
      case other =>
        fail(s"$where: \"$field\" must be a string, got ${kind(other)}")
    }

  private def kind(jv: JValue): String =
    jv.getClass.getSimpleName.stripPrefix("J").toLowerCase

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)
}
