package graft

/** Mechanical scanner for `explain("formatted")` output — the single
  * source of truth behind PLANS.md's headline counts and
  * PlanAuditSuite's surface-wide invariants.
  *
  * Why a node-header state machine and not a grep: formatted explain
  * prints each physical node as a detail header `(N) NodeName ...`
  * followed by attribute lines, with the node's ARGUMENTS on a separate
  * `Arguments: ...` line. A single-partition exchange therefore never
  * prints as the string "Exchange SinglePartition" — it is
  * `(N) Exchange` + `Arguments: SinglePartition, ENSURE_REQUIREMENTS,
  * ...` two lines apart. Round 6's PLANS.md claimed "0 Exchange
  * SinglePartition" off exactly that grep artifact; this scanner counts
  * the argument line under its owning node, and counts each node ONCE
  * (the tree section at the top prints `NodeName (N)`, which a plain
  * grep double-counts).
  */
object PlanAudit {

  final case class Counts(
      exchanges: Int,
      singlePartitionExchanges: Int,
      sortMergeJoins: Int,
      broadcastHashJoins: Int,
      broadcastNestedLoopJoins: Int,
      cartesianProducts: Int) {
    def +(o: Counts): Counts = Counts(
      exchanges + o.exchanges,
      singlePartitionExchanges + o.singlePartitionExchanges,
      sortMergeJoins + o.sortMergeJoins,
      broadcastHashJoins + o.broadcastHashJoins,
      broadcastNestedLoopJoins + o.broadcastNestedLoopJoins,
      cartesianProducts + o.cartesianProducts)
  }
  object Counts { val zero: Counts = Counts(0, 0, 0, 0, 0, 0) }

  private val NodeHeader = """^\((\d+)\)\s+(\S+).*""".r

  /** Count plan nodes in ONE query's formatted explain text. Only the
    * detail-section headers `(N) NodeName` are counted (each physical
    * node appears exactly once there); `Arguments:` lines attach to the
    * most recent header. */
  def scan(formatted: String): Counts = {
    var cur = ""
    var ex, sp, smj, bhj, bnlj, cart = 0
    formatted.linesIterator.foreach { line =>
      val t = line.trim
      t match {
        case NodeHeader(_, name) =>
          cur = name
          name match {
            case "Exchange" => ex += 1
            // AQE reuses subtrees via ShuffleQueryStage in re-planned
            // dumps; initial plans (what Plans.scala dumps) print plain
            // Exchange nodes only.
            case "SortMergeJoin" => smj += 1
            case "BroadcastHashJoin" => bhj += 1
            case "BroadcastNestedLoopJoin" => bnlj += 1
            case "CartesianProduct" => cart += 1
            case _ =>
          }
        case _ if t.startsWith("Arguments: ") =>
          if (cur == "Exchange" &&
              t.stripPrefix("Arguments: ").startsWith("SinglePartition"))
            sp += 1
        case _ =>
      }
    }
    Counts(ex, sp, smj, bhj, bnlj, cart)
  }

  /** Per-query expected `Exchange SinglePartition` counts over the
    * batch surface at sf0.001 — every entry audited as bounded-input
    * (scalar-aggregate final combines, or global sorts/windows over
    * already-aggregated frames whose size is fixed by construction:
    * percentile grids, per-class panels, convergence scalars).
    * PlanAuditSuite asserts equality, so a NEW single-partition
    * exchange — the thing that serializes a data-sized stream through
    * one task at 100 TB — fails the build and must either be fixed or
    * consciously added here with its boundedness argument.
    */
  val singlePartitionAllowlist: Map[String, Int] = Map.empty // regenerated below
}
