package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental JOIN-view maintenance — the delta-rule complement of
  * [[IncrementalAgg]]: for a materialized view V = A ⋈ B, a batch of
  * inserts (ΔA, ΔB) contributes exactly
  *
  *   ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB
  *
  * (the inclusion–exclusion expansion of (A ∪ ΔA) ⋈ (B ∪ ΔB) minus
  * A ⋈ B). Appending ΔV to the view is therefore EXACTLY equivalent to
  * re-joining the full inputs — under any batching of the inserts —
  * which is what the q147 oracle (a plain join over the whole input)
  * verifies hash-exactly.
  *
  * At 100 TB the wins are the standard IVM ones: each step joins the
  * DELTA against the state (and the tiny ΔA ⋈ ΔB), never state against
  * state; with both state tables bucketed by the join key all three
  * legs are co-located joins, and the view append is a partitioned
  * write. Insert-only streams (the warehouse's daily-load case) need no
  * retraction handling; deletes would add the symmetric minus terms.
  */
object IncrementalJoin {

  /** Maintained state for one equi-join view. */
  final case class JoinState(view: DataFrame, a: DataFrame, b: DataFrame)

  /** Empty initial state with the schemas of the two inputs. */
  def init(aSchema: DataFrame, bSchema: DataFrame, aKey: String,
           bKey: String): JoinState = {
    val a0 = aSchema.limit(0)
    val b0 = bSchema.limit(0)
    JoinState(a0.join(b0, a0(aKey) === b0(bKey)), a0, b0)
  }

  /** Fold one insert batch (ΔA, ΔB) into the state. */
  def step(st: JoinState, dA: DataFrame, dB: DataFrame, aKey: String,
           bKey: String): JoinState = {
    val dV = dA.join(st.b, dA(aKey) === st.b(bKey))
      .unionByName(st.a.join(dB, st.a(aKey) === dB(bKey)))
      .unionByName(dA.join(dB, dA(aKey) === dB(bKey)))
    JoinState(st.view.unionByName(dV),
      st.a.unionByName(dA), st.b.unionByName(dB))
  }
}
