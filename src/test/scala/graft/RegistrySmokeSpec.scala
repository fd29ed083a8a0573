package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The committed REGISTRY.json must stay in sync with the live
  * registry: same key set, same per-key oracle coverage, module names
  * from `SparkEntry.modules`. Regenerate with
  * `runMain graft.RegistryManifest` whenever a key is added.
  */
class RegistrySmokeSpec extends AnyFunSuite {

  private lazy val root = {
    val p = Paths.get(sys.props.getOrElse("user.dir", "."), "REGISTRY.json")
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
  }

  test("manifest keys match SparkEntry.queries exactly") {
    val entries = root.get("entries")
    val keys = (0 until entries.size())
      .map(i => entries.get(i).get("key").asText()).toSet
    assert(keys == SparkEntry.queries.keySet,
      s"stale REGISTRY.json — regenerate (missing: ${
        SparkEntry.queries.keySet -- keys}, extra: ${keys -- SparkEntry.queries.keySet})")
    assert(root.get("n_keys").asInt() == entries.size())
  }

  test("per-key oracle flags and module names are live values") {
    val mods = SparkEntry.modules.map(_._1).toSet
    val oracles = SparkEntry.oracleSql.keySet
    val entries = root.get("entries")
    (0 until entries.size()).foreach { i =>
      val e = entries.get(i)
      val k = e.get("key").asText()
      assert(mods.contains(e.get("module").asText()), s"$k: unknown module")
      assert(e.get("oracle").asBoolean() == oracles.contains(k),
        s"$k: oracle flag diverged")
      assert(e.get("indexes").isArray && e.get("module_specs").isArray)
    }
  }

  test("no cross-module key collisions — Map ++ would shadow silently") {
    // SparkEntry.queries is a ++ union of the module maps; a key
    // declared twice (e.g. a new module reusing an old number) would
    // silently drop one implementation and the oracle comparison would
    // test the WRONG query under the right name. Guard the invariant
    // that the union is collision-free, module by module.
    val owners = SparkEntry.modules
      .flatMap { case (m, qs, _) => qs.keys.map(_ -> m) }
      .groupBy(_._1).filter(_._2.length > 1)
    assert(owners.isEmpty,
      s"key(s) declared in multiple modules: " +
        owners.map { case (k, ms) =>
          s"$k(${ms.map(_._2).mkString("+")})" }.mkString(", "))
    assert(SparkEntry.modules.map(_._2.size).sum == SparkEntry.queries.size,
      "union size diverges from module sizes — a key was shadowed")
    assert(SparkEntry.modules.map(_._3.size).sum == SparkEntry.oracleSql.size,
      "oracle union size diverges — an oracle entry was shadowed")
  }

  test("oracle keys are a subset of query keys") {
    // an orphaned oracle entry (query renamed, oracle left behind)
    // would otherwise be silently dropped by the driver's comparison
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }

  test("PLANS exponent parser finds the known sweep measurements") {
    val plans = new String(Files.readAllBytes(
      Paths.get(sys.props.getOrElse("user.dir", "."), "PLANS.md")),
      StandardCharsets.UTF_8)
    val exps = RegistryManifest.parseExponents(plans)
    // anchors from three different table formats/rounds
    assert(exps.get("w3_percent_rank").nonEmpty, "r12 join-tier table unparsed")
    assert(exps.get("s16_filtered_recall").contains(0.08), "r12 new-op table unparsed")
    assert(exps.get("x17_bm25").nonEmpty, "r10 retrieval table unparsed")
    // superseded pre-fix rows must not leak through
    assert(!exps.get("v2_referential_integrity").contains(1.09),
      "pre-fix v2 measurement leaked into the manifest")
  }
}
