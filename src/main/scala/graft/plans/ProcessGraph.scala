package graft.plans

import graft.core._
import graft.functions.{ArrayFns, Reducers, Scalar}
import graft.operators._
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** OpenEO process-graph front end (SURVEY.md §3.4).
  *
  * The reference delegates graph parsing/execution to the external
  * `openeo-pg-parser-networkx` package and executes node-by-node in graph
  * order with no optimizer (reference: README.md:11, core.py:16-103). Here
  * the graph COMPILES: scalar callback sub-graphs become single Catalyst
  * Column trees (fused by whole-stage codegen), reducer sub-graphs become
  * aggregate Columns, and cube-level nodes chain DataCube operators — the
  * result is one unexecuted DataFrame whose logical plan Catalyst then
  * analyzes and optimizes across ALL nodes at once. `ParameterReference`
  * (`from_parameter`) resolution mirrors core.py:44-69.
  *
  * Graph format: `{"process_graph": {nodeId: {"process_id": ...,
  * "arguments": {...}, "result": true}}}` with `{"from_node": id}` and
  * `{"from_parameter": name}` references and nested
  * `{"process_graph": ...}` callbacks — the standard OpenEO wire format.
  */
object ProcessGraph {

  /** Runtime values a node can produce. */
  sealed trait PValue
  final case class CubeV(cube: DataCube) extends PValue
  /** A non-cube relational result — vector cubes (load_geojson /
    * load_vector_cube / vector_*) and label tables (dimension_labels,
    * rqadeforestation summaries). The reference passes geopandas /
    * xr.Dataset objects between such nodes; here it's an unexecuted
    * DataFrame like everything else.
    */
  final case class TableV(df: org.apache.spark.sql.DataFrame) extends PValue
  /** A fitted model flowing fit_* → predict_* (the reference passes the
    * model object through the graph the same way, ml/random_forest.py).
    * `features` pins the assembler's column order so predict uses exactly
    * the training layout.
    */
  final case class ModelV(model: AnyRef, features: Seq[String]) extends PValue
  final case class ColV(col: Column) extends PValue
  /** A LABELED array (openEO array_create_labeled): a labels→values map
    * column. A distinct PValue so the labeled-array error contract
    * (ArrayLabelConflict, ArrayElementNotAvailable by label) dispatches
    * structurally, the way the reference dispatches on xr.DataArray vs
    * ndarray (reference arrays.py:49-63); generic consumers unwrap it to
    * the raw map column via `column(...)`.
    */
  final case class LabeledV(col: Column) extends PValue
  final case class NumV(v: Double) extends PValue
  final case class StrV(v: String) extends PValue
  final case class BoolV(v: Boolean) extends PValue
  final case class ArrV(v: Seq[PValue]) extends PValue
  case object NullV extends PValue

  private final case class Node(id: String, processId: String,
      args: Map[String, JValue], result: Boolean)

  /** Implementation signature for USER-REGISTERED processes: evaluated
    * arguments plus a callback runner (`(callbackJson, params) => PValue`)
    * so custom processes can accept child process graphs. Return `CubeV`
    * for cube-level processes or `ColV` for scalar processes — scalar
    * registrations become usable inside apply/reduce callbacks exactly
    * like built-ins.
    */
  type CustomProcess =
    (Map[String, PValue], (String, Map[String, PValue]) => PValue) => PValue

  private val customProcesses =
    scala.collection.concurrent.TrieMap.empty[String, CustomProcess]

  /** Register a custom process under `pid`, mirroring the reference's
    * extensible process registry (process_implementations/core.py:16-84
    * wraps arbitrary user functions for registration): after this call any
    * graph may use `pid` as a node or inside a callback. A custom process
    * SHADOWS a built-in of the same id — latest registration wins, which
    * is also how a deployment patches one process without forking the
    * engine. Registration is process-wide (all sessions of this JVM).
    */
  def registerProcess(pid: String, impl: CustomProcess): Unit =
    customProcesses.put(pid, impl)

  /** Remove a custom process; built-ins reappear if shadowed. */
  def unregisterProcess(pid: String): Unit = customProcesses.remove(pid)

  /** Execute a process-graph JSON document. `collections` resolves
    * `load_collection` ids to cubes (the engine's equivalent of the
    * backend's catalog).
    */
  def execute(spark: SparkSession, json: String,
      collections: String => DataCube): DataCube = {
    val root = JsonMethods.parse(json)
    val pg = root \ "process_graph" match {
      case JNothing => root
      case x => x
    }
    evalGraph(pg, Map.empty, collections) match {
      case CubeV(c) => c
      case other => throw new IllegalArgumentException(
        s"graph result is not a cube: $other")
    }
  }

  /** Like [[execute]] but returns whatever the result node produced —
    * needed for graphs ending in a vector/table node (dimension_labels,
    * vector_buffer, rqadeforestation) or a fitted model.
    */
  def executeValue(spark: SparkSession, json: String,
      collections: String => DataCube): PValue = {
    val root = JsonMethods.parse(json)
    val pg = root \ "process_graph" match {
      case JNothing => root
      case x => x
    }
    evalGraph(pg, Map.empty, collections)
  }

  private def nodes(pg: JValue): Map[String, Node] = pg match {
    case JObject(fields) => fields.map { case (id, body) =>
      val pid = (body \ "process_id") match {
        case JString(s) => s
        case _ => throw new IllegalArgumentException(s"node $id: no process_id")
      }
      val args = (body \ "arguments") match {
        case JObject(a) => a.toMap
        case _ => Map.empty[String, JValue]
      }
      val res = (body \ "result") == JBool(true)
      id -> Node(id, pid, args, res)
    }.toMap
    case _ => throw new IllegalArgumentException("process graph must be an object")
  }

  /** Statistical reducers with a partial-aggregation fast path. */
  private val PlainAggregates = Set("mean", "sum", "min", "max", "median",
    "sd", "variance", "count", "product", "extrema", "any", "all",
    "first", "last", "quantiles")

  /** True when every node of a reducer callback is a plain statistical
    * aggregate — the shape [[graft.operators.ReduceOps.reduceDimension]]'s
    * map-side-combine path handles. Anything else (band math over
    * `array_element`, scalar composition) gets the ordered-array reduce,
    * which is the general openEO semantics at the cost of a
    * collect_list per group.
    */
  private[plans] def isPlainAggregateReducer(cbJson: String): Boolean =
    try {
      (JsonMethods.parse(cbJson) \ "process_graph") match {
        case JObject(fields) => fields.nonEmpty && fields.forall {
          case (_, body) => (body \ "process_id") match {
            case JString(p) => PlainAggregates(p)
            case _ => false
          }
        }
        case _ => false
      }
    } catch { case _: Throwable => false }

  /** Every process_id mentioned anywhere in a callback graph, including
    * nested sub-callbacks (array_apply / count conditions / ...).
    */
  private def processIds(j: JValue): Set[String] = j match {
    case JObject(fields) => fields.iterator.flatMap { case (k, v) =>
      val self: Set[String] =
        if (k == "process_id") v match {
          case JString(s) => Set(s)
          case _ => Set.empty
        } else Set.empty
      self ++ processIds(v)
    }.toSet
    case JArray(xs) => xs.iterator.flatMap(processIds).toSet
    case _ => Set.empty
  }

  /** Process ids whose `data` argument means "the whole series array"
    * inside an apply_dimension / reduce_dimension callback — anything NOT
    * in this family (and not an `array_*` process) is an element-wise
    * scalar process that broadcasts over the series, numpy-style
    * (reference cubes/apply.py:42-128 hands the axis array to the
    * callback; `data * 2` there is element-wise).
    */
  private val ArrayAwareIds: Set[String] = PlainAggregates ++ Set(
    "sort", "order", "rearrange", "cumsum", "cummax", "cummin",
    "cumproduct", "array_interpolate_linear")

  /** True when the callback graph touches no array-aware process —
    * a pure element-wise scalar chain.
    */
  private[plans] def isElementwiseCallback(cbJson: String): Boolean =
    try {
      val ids = processIds(JsonMethods.parse(cbJson))
      ids.nonEmpty &&
        ids.forall(id => !ArrayAwareIds(id) && !id.startsWith("array_"))
    } catch { case _: Throwable => false }

  /** Process ids with O(n) cube-level WINDOW twins along a dimension. An
    * apply_dimension callback that is a LINEAR chain of only these
    * compiles to chained window operators — no series array is ever
    * materialised. This is the scale path: the interpreted array folds
    * are O(n²) per series (each `aggregate` step copies the accumulator
    * array), which the sf0.1 bench measured at 88 s on a 20k-label
    * dimension; the window compilation of the same callback runs in
    * 0.5 s and holds at any dimension cardinality.
    */
  private val WindowChainIds: Set[String] = Set(
    "cumsum", "cummax", "cummin", "cumproduct",
    "array_interpolate_linear", "sort")

  /** A compiled apply_dimension chain segment: either a window-class
    * process with an O(n) cube-level twin, or a maximal run of
    * element-wise scalar nodes compiled to ONE zero-shuffle projection
    * (re-rendered as a synthetic callback graph over `data`, with
    * references to side-branch nodes rewired to `_sb_<id>` parameters).
    */
  private[plans] sealed trait ChainSeg
  private[plans] final case class WinSeg(pid: String, asc: Boolean)
    extends ChainSeg
  private[plans] final case class ScalSeg(cbJson: String) extends ChainSeg

  /** Head-anchored side branches of a compiled chain: `aggs` are
    * aggregate nodes over the raw series (`mean(data)`, `sd(data)`, …)
    * that compile to window aggregates partitioned by the series dims —
    * the SAME partitioning the chain's window ops use, so they add no
    * shuffle; `combos` are scalar combinations of those per-series
    * constants (`subtract(max(data), min(data))`), in dependency order,
    * each a synthetic single-node callback whose static references are
    * `_sb_<id>` parameters.
    */
  private[plans] final case class SidePlan(
      aggs: Seq[(String, String)], combos: Seq[(String, String)])

  private[plans] final case class ChainPlan(
      segs: Seq[ChainSeg], side: SidePlan)

  /** Aggregate process ids with window twins usable as head-anchored
    * side branches (openEO's numpy broadcast of a per-series statistic
    * over the series, reference cubes/apply.py:42-128 — e.g.
    * `subtract(data, mean(data))`).
    */
  private val WindowAggIds: Set[String] = Set(
    "mean", "sum", "min", "max", "count", "median", "sd", "variance",
    "product")

  /** Window twin of a head-anchored side-branch aggregate: evaluated
    * over the full series partition (no ordering, no frame), null-
    * skipping — matching the openEO aggregates' ignore_nodata=true
    * default and the array-fold twins in ArrayFns.
    */
  private def headAggCol(pid: String, v: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = pid match {
    case "mean" => avg(v).over(w)
    case "sum" => sum(v).over(w)
    case "min" => min(v).over(w)
    case "max" => max(v).over(w)
    case "count" => count(v).over(w)
    case "median" => median(v).over(w)
    case "sd" => stddev_samp(v).over(w)
    case "variance" => var_samp(v).over(w)
    case "product" => graft.functions.ProductAgg.column(v).over(w)
    case other => throw new IllegalArgumentException(
      s"no window twin for side-branch aggregate $other")
  }

  /** The callback as a linear chain of window-class nodes and
    * interleaved element-wise scalar nodes — plus head-anchored
    * aggregate side branches — first-to-last; or None when the data flow
    * isn't such a chain rooted at the `data` parameter (array-aware
    * processes in the chain, aggregates of intermediate nodes, fan-out
    * of the series into non-aggregate consumers, and non-literal extra
    * arguments all bail to the safe array-fold path). Mixed shapes like
    * `multiply(cumsum(data), 2)` and broadcast shapes like
    * `subtract(data, mean(data))` — the commonest composed callbacks
    * under the openEO ordered-array contract — thereby stay on the O(n)
    * window path: scalar steps become projections between (or around)
    * the window operators, sharing one series shuffle.
    */
  private[plans] def chainPlan(cbJson: String): Option[ChainPlan] =
    try {
      (JsonMethods.parse(cbJson) \ "process_graph") match {
        case JObject(fs) if fs.nonEmpty =>
          val ns = fs.toMap

          // any series/node reference inside a JSON subtree — used to
          // reject nodes whose NON-chain arguments are not plain
          // literals (conservative: those callbacks take the safe path)
          def hasRef(j: JValue): Boolean = j match {
            case JObject(fields) => fields.exists {
              case ("from_node", _) => true
              case ("from_parameter", JString(p)) => p == "data" || p == "x"
              case (_, v) => hasRef(v)
            }
            case JArray(xs) => xs.exists(hasRef)
            case _ => false
          }

          def argFieldsOf(body: JValue): List[(String, JValue)] =
            (body \ "arguments") match {
              case JObject(af) => af
              case _ => Nil
            }
          def directNodeRef(v: JValue): Option[String] = v match {
            case JObject(vf) => vf.toMap.get("from_node") match {
              case Some(JString(id)) => Some(id)
              case _ => None
            }
            case _ => None
          }
          def isHeadParam(v: JValue): Boolean = v match {
            case JObject(vf) => vf.toMap.get("from_parameter") match {
              case Some(JString(p)) => p == "data" || p == "x"
              case _ => false
            }
            case _ => false
          }

          // static classification: a node is a per-series CONSTANT when
          // it is an aggregate of the raw series (head param) with
          // default null handling, or a scalar combination of literals
          // and other static nodes. Memoised; cycles classify false.
          val staticMemo = scala.collection.mutable.Map.empty[String, Boolean]
          val staticVisiting = scala.collection.mutable.Set.empty[String]
          def isStatic(id: String): Boolean = staticMemo.getOrElseUpdate(id, {
            if (!staticVisiting.add(id)) false
            else try ns.get(id).exists { body =>
              (body \ "process_id") match {
                case JString(pid) if WindowAggIds(pid) =>
                  val af = argFieldsOf(body)
                  af.exists { case (k, v) => k == "data" && isHeadParam(v) } &&
                    af.forall {
                      case ("data", _) => true
                      case ("ignore_nodata", JBool(true)) => true
                      case _ => false // any other arg bails to the fold
                    }
                case JString(pid) if !ArrayAwareIds(pid) &&
                    !pid.startsWith("array_") && !WindowChainIds(pid) =>
                  argFieldsOf(body).forall { case (_, v) =>
                    directNodeRef(v) match {
                      case Some(rid) => isStatic(rid)
                      case None => !hasRef(v)
                    }
                  }
                case _ => false
              }
            } finally staticVisiting.remove(id)
          })

          val resOpt = ns.collectFirst {
            case (id, b) if (b \ "result") == JBool(true) => id
          }
          var ok = resOpt.isDefined
          var cur = resOpt.getOrElse("")
          // (id, body, pid, chain-arg name, static refs), first-to-last
          var chain =
            List.empty[(String, JValue, String, String, Set[String])]
          var done = false
          val visited = scala.collection.mutable.Set.empty[String]
          while (ok && !done) {
            if (!visited.add(cur)) ok = false
            else ns.get(cur) match {
              case Some(body) => (body \ "process_id") match {
                case JString(pid) =>
                  val isWin = WindowChainIds(pid)
                  val isScalar = !isWin && !ArrayAwareIds(pid) &&
                    !pid.startsWith("array_")
                  val argFields = argFieldsOf(body)
                  // classify arguments: the ONE argument carrying the
                  // series (a direct node ref to a non-static node, or
                  // the head param), direct refs to static side-branch
                  // nodes, and literals
                  val chainArgs = argFields.filter { case (_, v) =>
                    isHeadParam(v) ||
                      directNodeRef(v).exists(rid => !isStatic(rid))
                  }
                  val staticRefs = argFields.flatMap { case (_, v) =>
                    directNodeRef(v).filter(isStatic)
                  }.toSet
                  val otherRefs = argFields.exists { case (k, v) =>
                    !chainArgs.exists(_._1 == k) &&
                      directNodeRef(v).isEmpty && hasRef(v)
                  }
                  if (!(isWin || isScalar) || chainArgs.size != 1 ||
                      otherRefs ||
                      (isWin && (chainArgs.head._1 != "data" ||
                        staticRefs.nonEmpty)))
                    ok = false
                  else {
                    val (argName, argVal) = chainArgs.head
                    chain = (cur, body, pid, argName, staticRefs) :: chain
                    directNodeRef(argVal) match {
                      case Some(prev) => cur = prev
                      case None => done = true // head param
                    }
                  }
                case _ => ok = false
              }
              case None => ok = false
            }
          }
          if (!(ok && done)) None
          else {
            // side-branch closure: every static node referenced from the
            // chain, plus their static dependencies, in dependency order
            val sideOrder =
              scala.collection.mutable.LinkedHashMap.empty[String, JValue]
            def addSide(id: String): Unit =
              if (!sideOrder.contains(id)) ns.get(id).foreach { body =>
                argFieldsOf(body).foreach { case (_, v) =>
                  directNodeRef(v).foreach(addSide)
                }
                sideOrder.put(id, body)
              }
            chain.foreach { case (_, _, _, _, refs) => refs.foreach(addSide) }
            val chainIds = chain.map(_._1).toSet
            val covered = chainIds ++ sideOrder.keySet
            val worthIt =
              chain.exists { case (_, _, pid, _, _) => WindowChainIds(pid) } ||
                sideOrder.nonEmpty
            if (covered.size != ns.size || covered != ns.keySet ||
                chainIds.exists(sideOrder.contains) || !worthIt) None
            else {
              // rewire a node body's static references to _sb_ params
              def rewire(body: JValue, chainArg: Option[String],
                  isResult: Boolean): JValue = {
                val newArgs = argFieldsOf(body).map { case (k, v) =>
                  if (chainArg.contains(k))
                    k -> (JObject(List(
                      "from_parameter" -> JString("data"))): JValue)
                  else directNodeRef(v).filter(isStatic) match {
                    case Some(rid) => k -> (JObject(List(
                      "from_parameter" -> JString(s"_sb_$rid"))): JValue)
                    case None => k -> v
                  }
                }
                JObject(List(
                  "process_id" -> (body \ "process_id"),
                  "arguments" -> (JObject(newArgs): JValue),
                  "result" -> (JBool(isResult): JValue)))
              }
              def wrap(nodes: Seq[(String, JValue)]): String =
                JsonMethods.compact(JsonMethods.render(JObject(List(
                  "process_graph" -> (JObject(nodes.toList): JValue)))))

              val aggs = sideOrder.toSeq.collect {
                case (id, body) if ((body \ "process_id") match {
                  case JString(p) => WindowAggIds(p)
                  case _ => false
                }) => id -> (body \ "process_id").asInstanceOf[JString].s
              }
              val aggIds = aggs.map(_._1).toSet
              val combos = sideOrder.toSeq.collect {
                case (id, body) if !aggIds(id) =>
                  id -> wrap(Seq(id -> rewire(body, None, isResult = true)))
              }

              val segs = scala.collection.mutable.ListBuffer.empty[ChainSeg]
              var run = List.empty[(String, JValue, String)]
              def flushRun(): Unit = if (run.nonEmpty) {
                val nodesJson = run.zipWithIndex.map {
                  case ((id, body, chainArg), i) =>
                    // the first node of a run takes its series input
                    // from outside the run (the previous window step or
                    // the callback head) — rewire it to the `data`
                    // parameter; internal from_node references stay
                    id -> rewire(body,
                      chainArg = if (i == 0) Some(chainArg) else None,
                      isResult = i == run.size - 1)
                }
                segs += ScalSeg(wrap(nodesJson))
                run = Nil
              }
              chain.foreach { case (id, body, pid, chainArg, _) =>
                if (WindowChainIds(pid)) {
                  flushRun()
                  val asc = (body \ "arguments" \ "asc") != JBool(false)
                  segs += WinSeg(pid, asc)
                } else run = run :+ ((id, body, chainArg))
              }
              flushRun()
              Some(ChainPlan(segs.toList, SidePlan(aggs, combos)))
            }
          }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Callback RESULT nodes statically known to keep series length — with
    * target == source dimension these preserve the dimension's labels
    * (the reference detects this at runtime by comparing axis lengths,
    * cubes/apply.py:96-103; these ids always match).
    */
  private val LengthPreservingIds: Set[String] = Set(
    "sort", "array_apply", "array_interpolate_linear",
    "cumsum", "cummax", "cummin", "cumproduct")

  private[plans] def isLengthPreservingCallback(cbJson: String): Boolean =
    try {
      (JsonMethods.parse(cbJson) \ "process_graph") match {
        case JObject(fields) => fields.exists { case (_, body) =>
          (body \ "result") == JBool(true) &&
            ((body \ "process_id") match {
              case JString(p) => LengthPreservingIds(p)
              case _ => false
            })
        }
        case _ => false
      }
    } catch { case _: Throwable => false }

  private def evalGraph(pg: JValue, params: Map[String, PValue],
      collections: String => DataCube): PValue = {
    val ns = nodes(pg)
    val resultNode = ns.values.find(_.result).getOrElse(
      throw new IllegalArgumentException("no result node"))
    val memo = scala.collection.mutable.Map.empty[String, PValue]

    def evalNode(id: String): PValue = memo.getOrElseUpdate(id, {
      val n = ns.getOrElse(id,
        throw new IllegalArgumentException(s"unknown node $id"))
      applyProcess(n.processId,
        n.args.map { case (k, v) => k -> evalArg(v) }, params, collections)
    })

    def evalArg(v: JValue): PValue = v match {
      case JObject(fields) =>
        val m = fields.toMap
        if (m.contains("from_node")) evalNode(m("from_node").asInstanceOf[JString].s)
        else if (m.contains("from_parameter")) {
          val p = m("from_parameter").asInstanceOf[JString].s
          params.getOrElse(p, throw new IllegalArgumentException(
            s"ProcessParameterMissing: $p"))
        }
        else
          // callback graphs stay unevaluated here (applyProcess re-walks
          // them); GeoJSON geometries and options maps likewise pass through
          // as raw JSON text for the receiving process to parse
          StrV(JsonMethods.compact(JsonMethods.render(v)))
      case JString(s) => StrV(s)
      case JInt(i) => NumV(i.toDouble)
      case JDouble(d) => NumV(d)
      case JDecimal(d) => NumV(d.toDouble)
      case JLong(l) => NumV(l.toDouble)
      case JBool(b) => BoolV(b)
      case JArray(xs) => ArrV(xs.map(evalArg))
      case JNull | JNothing => NullV
      case JSet(xs) => ArrV(xs.toSeq.map(evalArg)) // json4s-internal, never parsed from wire JSON
    }

    def applyProcess(pid: String, args: Map[String, PValue],
        outerParams: Map[String, PValue],
        colls: String => DataCube): PValue = {
      Registry.apply(pid, args, (cbJson, cbParams) =>
        evalGraph(JsonMethods.parse(cbJson) \ "process_graph",
          cbParams, colls), colls, outerParams)
    }

    evalNode(resultNode.id)
  }

  /** The process registry: process_id → implementation over PValues.
    * Mirrors the reference's auto-registered ProcessRegistry
    * (core.py:97-103) with explicit registration.
    */
  private object Registry {

    type Callback = (String, Map[String, PValue]) => PValue

    /** `ctx` carries the parameter map of the graph evaluation this process
      * runs INSIDE — ambient context a node's own arguments can't express.
      * Today it holds one key: `_order`, the reduced dimension's column,
      * injected by ordered-reduce callers so position-dependent reducers
      * (first/last) aggregate by dimension order instead of erroring.
      */
    def apply(pid: String, args: Map[String, PValue], runCallback: Callback,
        collections: String => DataCube,
        ctx: Map[String, PValue] = Map.empty): PValue = {

      // user registrations shadow built-ins (latest registration wins)
      customProcesses.get(pid) match {
        case Some(impl) => return impl(args, runCallback)
        case None =>
      }

      def cube(name: String): DataCube = args(name) match {
        case CubeV(c) => c
        case v => throw new IllegalArgumentException(s"$pid.$name: not a cube ($v)")
      }
      def table(name: String): org.apache.spark.sql.DataFrame = args(name) match {
        case TableV(df) => df
        case CubeV(c) => c.df // a cube is also a table; vector ops accept both
        case v => throw new IllegalArgumentException(s"$pid.$name: not a table ($v)")
      }
      def column(name: String): Column = args(name) match {
        case ColV(c) => c
        case LabeledV(c) => c
        case NumV(v) => lit(v)
        case StrV(s) => lit(s)
        case BoolV(b) => lit(b)
        case NullV => lit(null)
        case ArrV(xs) => array(xs.map { // literal arrays for array processes
          case NumV(v) => lit(v)
          case StrV(s) => lit(s)
          case BoolV(b) => lit(b)
          case NullV => lit(null)
          case ColV(c) => c
          case v => throw new IllegalArgumentException(
            s"$pid.$name: array element $v is not scalar")
        }: _*)
        case v => throw new IllegalArgumentException(s"$pid.$name: not scalar ($v)")
      }
      def str(name: String): String = args(name) match {
        case StrV(s) => s
        case v => throw new IllegalArgumentException(s"$pid.$name: not a string ($v)")
      }
      def num(name: String): Double = args(name) match {
        case NumV(v) => v
        case v => throw new IllegalArgumentException(s"$pid.$name: not a number ($v)")
      }
      def strs(name: String): Seq[String] = args(name) match {
        case ArrV(xs) => xs.map { case StrV(s) => s; case v => v.toString }
        case v => throw new IllegalArgumentException(s"$pid.$name: not an array ($v)")
      }
      def opt(name: String): Option[PValue] =
        args.get(name).filterNot(_ == NullV)

      /** a nullable string element of an extent array: openEO allows
        * `null` for an open temporal bound (reference: cubes/load.py:140-149)
        */
      def nullableStr(v: PValue, where: String): Option[String] = v match {
        case NullV => None
        case StrV(s) => Some(s)
        case other => throw new IllegalArgumentException(
          s"$pid.$where: expected string or null, got $other")
      }

      /** The openEO `context` argument, forwarded into callback graphs as
        * the `context` parameter ({"from_parameter": "context"} — the
        * reference threads it through every cube process's callback).
        */
      def callbackContext: Map[String, PValue] =
        args.get("context").map("context" -> _).toMap

      /** run a callback sub-graph (stored as JSON text) as a scalar
        * Column→Column process (reference: `apply`'s `process` argument)
        */
      def scalarCallback(name: String): Column => Column = {
        val cbJson = str(name)
        c => runCallback(cbJson,
          Map("x" -> ColV(c), "data" -> ColV(c)) ++ callbackContext) match {
          case ColV(out) => out
          case LabeledV(out) => out // labeled array result: the raw map
          case NumV(v) => lit(v)
          case v => throw new IllegalArgumentException(s"callback returned $v")
        }
      }

      /** Polygon outer rings from GeoJSON text (Polygon / Feature /
        * FeatureCollection), with zone ids from feature `properties.id`
        * (else the feature index) — the graph-side twin of the reference's
        * geopandas parsing.
        */
      def rings(json: String): Seq[(String, graft.geo.Geo.Ring)] = {
        implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
        val root = JsonMethods.parse(json)
        def polyRing(geom: JValue): Option[graft.geo.Geo.Ring] =
          (geom \ "type") match {
            case JString("Polygon") =>
              Some((geom \ "coordinates").extract[List[List[List[Double]]]]
                .head.map(c => (c(0), c(1))))
            case _ => None
          }
        val out = (root \ "type") match {
          case JString("Polygon") => polyRing(root).map("0" -> _).toSeq
          case JString("Feature") => polyRing(root \ "geometry").map("0" -> _).toSeq
          case JString("FeatureCollection") =>
            (root \ "features").extract[List[JValue]].zipWithIndex.flatMap {
              case (f, i) =>
                polyRing(f \ "geometry").map { r =>
                  val id = (f \ "properties" \ "id") match {
                    case JString(s) => s
                    case _ => i.toString
                  }
                  id -> r
                }
            }
          case _ => Nil
        }
        if (out.isEmpty) throw new IllegalArgumentException(
          s"GeometryInvalid: no polygon in $json")
        out
      }

      /** resample_spatial's aggregating-method dispatch over a (possibly
        * projection-warped) cube
        */
      def resampleByMethod(c: DataCube, res: Double): PValue =
        CubeV(ResampleOps.resampleByMethod(c, res, res, str("method")))

      /** run a reducer sub-graph as an aggregate Column builder; `order`
        * (the reduced dimension's column) flows into the callback's context
        * so ordered reducers (first/last) can aggregate by dimension order
        */
      def reducerCallback(name: String, order: Option[Column] = None): Column => Column = {
        val cbJson = str(name)
        val ctx = order.map(o => "_order" -> ColV(o)).toMap ++ callbackContext
        c => runCallback(cbJson, Map("data" -> ColV(c)) ++ ctx) match {
          case ColV(out) => out
          case v => throw new IllegalArgumentException(s"reducer returned $v")
        }
      }

      pid match {
        // ---- cube-level ----
        case "load_collection" =>
          // the canonical openEO load signature: every example graph
          // passes spatial_extent/temporal_extent/bands here, so the
          // node composes the corresponding filters over the resolved
          // cube (each optional; the filters are plan-time no-ops on
          // absent args, and Catalyst pushes the survivors into the scan)
          var c = collections(str("id"))
          opt("temporal_extent").foreach { _ =>
            val ext = args("temporal_extent").asInstanceOf[ArrV].v
            c = FilterOps.filterTemporal(c,
              nullableStr(ext(0), "temporal_extent"),
              nullableStr(ext(1), "temporal_extent"), None)
          }
          opt("spatial_extent").foreach { _ =>
            val e = JsonMethods.parse(str("spatial_extent"))
            def d(f: String): Option[Double] = (e \ f) match {
              case JDouble(x) => Some(x)
              case JInt(x) => Some(x.toDouble)
              case JDecimal(x) => Some(x.toDouble)
              case _ => None
            }
            (d("west"), d("east"), d("south"), d("north")) match {
              case (Some(w), Some(ea), Some(so), Some(no)) =>
                c = FilterOps.filterBbox(c, w, ea, so, no)
              case _ => throw new IllegalArgumentException(
                "load_collection.spatial_extent: need west/east/south/north")
            }
          }
          opt("bands").foreach(_ => c = FilterOps.filterBands(c, strs("bands")))
          CubeV(c)
        case "filter_temporal" =>
          val ext = args("extent").asInstanceOf[ArrV].v
          CubeV(FilterOps.filterTemporal(cube("data"),
            nullableStr(ext(0), "extent"), nullableStr(ext(1), "extent"),
            opt("dimension").map(_.asInstanceOf[StrV].v)))
        case "filter_bands" =>
          // reference _filter.py:133-140: absent `bands` and a missing
          // band dimension each have their own named error
          if (opt("bands").isEmpty) throw new IllegalArgumentException(
            "BandFilterParameterMissing: the process `filter_bands` " +
              "requires the parameter `bands` to be set")
          CubeV(FilterOps.filterBands(cube("data"), strs("bands")))
        case "filter_bbox" =>
          val e = args("extent").asInstanceOf[ArrV].v.map(_.asInstanceOf[NumV].v)
          CubeV(FilterOps.filterBbox(cube("data"), e(0), e(1), e(2), e(3)))
        case "filter_labels" =>
          CubeV(FilterOps.filterLabels(cube("data"), str("dimension"),
            l => scalarCallback("condition")(l).cast("boolean")))
        case "apply" =>
          CubeV(ApplyOps.apply(cube("data"), scalarCallback("process")))
        case "apply_dimension" =>
          // openEO contract: the callback receives the label-ordered value
          // ARRAY along the dimension (reference cubes/apply.py:42-128).
          // Three compiled shapes, cheapest first:
          //  - pure element-wise callback, dim labels unchanged: identical
          //    to `apply` — ZERO shuffle, no arrays ever built;
          //  - element-wise under a target rename: the scalar chain maps
          //    over the series array (`transform`);
          //  - anything composing array-aware processes: the callback runs
          //    with `_array` context — statistical reducers flip to array
          //    folds, cumulative/interpolate to their array forms, and
          //    label-based array_element gets the dim's label list (one
          //    metadata-scale distinct, only when the callback says
          //    "label"). Length-preserving result nodes keep the dim's
          //    labels (the reference's runtime length check, decided
          //    statically here); everything else relabels 0..n-1.
          val dim = str("dimension")
          val cbJson = str("process")
          val c = cube("data")
          val target = opt("target_dimension").map(_.asInstanceOf[StrV].v)
          val elementwise = isElementwiseCallback(cbJson)
          if (elementwise && target.forall(_ == dim)) {
            c.requireDim(dim)
            CubeV(ApplyOps.apply(c, scalarCallback("process")))
          } else chainPlan(cbJson) match {
            case Some(ChainPlan(segs, side)) =>
              // linear chain of window-class processes, possibly with
              // interleaved element-wise scalar nodes: compile to O(n)
              // window operators sharing one series shuffle, with each
              // scalar run a zero-shuffle projection between them —
              // never materialise the series array (the scale path).
              // Head-anchored aggregate side branches (`mean(data)` …)
              // become window aggregates over the same series partition
              // attached BEFORE the chain transforms the value, then
              // per-series-constant columns the scalar runs reference.
              c.requireDim(dim)
              var cur = c
              val sbCols = scala.collection.mutable.LinkedHashMap
                .empty[String, Column]
              if (side.aggs.nonEmpty) {
                val others = c.dimColsExcept(dim)
                val w = org.apache.spark.sql.expressions.Window
                  .partitionBy(others: _*)
                side.aggs.foreach { case (id, aggPid) =>
                  cur = cur.withDf(_.withColumn(s"_sb_$id",
                    headAggCol(aggPid, cur.value, w)))
                  sbCols(id) = col(s"_sb_$id")
                }
              }
              def sbBinds: Map[String, PValue] =
                sbCols.map { case (id, sc) =>
                  s"_sb_$id" -> (ColV(sc): PValue) }.toMap
              side.combos.foreach { case (id, comboJson) =>
                sbCols(id) = runCallback(comboJson,
                  sbBinds ++ callbackContext) match {
                  case ColV(out) => out
                  case NumV(n) => lit(n)
                  case other => throw new IllegalArgumentException(
                    s"apply_dimension side branch returned $other")
                }
              }
              segs.foreach {
                case WinSeg(p, asc) =>
                  cur = p match {
                    case "cumsum" => WindowOps.cumsum(cur, dim)
                    case "cummax" => WindowOps.cummax(cur, dim)
                    case "cummin" => WindowOps.cummin(cur, dim)
                    case "cumproduct" => WindowOps.cumprodExact(cur, dim)
                    case "array_interpolate_linear" =>
                      WindowOps.interpolateLinearByPosition(cur, dim)
                    case _ => WindowOps.sortAlong(cur, dim, ascending = asc)
                  }
                case ScalSeg(segJson) =>
                  cur = ApplyOps.apply(cur, v =>
                    runCallback(segJson, Map("x" -> ColV(v),
                      "data" -> ColV(v)) ++ sbBinds ++
                      callbackContext) match {
                      case ColV(out) => out
                      case NumV(n) => lit(n)
                      case other => throw new IllegalArgumentException(
                        s"apply_dimension callback returned $other")
                    })
              }
              if (side.aggs.nonEmpty)
                cur = cur.withDf(
                  _.drop(side.aggs.map(a => s"_sb_${a._1}"): _*))
              CubeV(ApplyOps.retargetPreserved(cur, dim, target))
            case None =>
          {
            // the array-fold path is O(n²) per series (each aggregate
            // step copies the accumulator array): measured 88 s vs 0.6 s
            // on a 20k-label dimension at sf0.1. Guard the cliff: bail
            // loudly above a label-cardinality cap instead of silently
            // running a quadratic fold over a huge dimension. The
            // element-wise form compiles to a linear `transform`, so it
            // is exempt; the cap is a session conf escape hatch.
            if (!elementwise) {
              val maxFold = c.df.sparkSession.conf
                .get("graft.applyDimension.foldMaxLabels", "8192").toLong
              val nLabels = c.meta.dims.find(_.name == dim)
                .flatMap(_.labels).map(_.size.toLong)
                .getOrElse(c.df.select(col(dim)).distinct().count())
              if (nLabels > maxFold) throw new IllegalArgumentException(
                s"apply_dimension: callback is not window-compilable and " +
                  s"dimension '$dim' has $nLabels labels (> $maxFold); the " +
                  "array-fold path is O(n²) per series. Rewrite the " +
                  "callback as a chain of element-wise and window-class " +
                  "processes, or raise " +
                  "spark.conf graft.applyDimension.foldMaxLabels to override")
            }
            val labelCtx: Map[String, PValue] =
              if (elementwise || !cbJson.contains("\"label\"")) Map.empty
              else Map("_labels" -> ArrV(
                c.df.select(col(dim)).distinct()
                  .orderBy(col(dim)).collect().toSeq
                  .map(r => StrV(String.valueOf(r.get(0))))))
            def run(bind: Map[String, PValue]): Column =
              runCallback(cbJson, bind ++ callbackContext) match {
                case ColV(out) => out
                case NumV(v) => lit(v)
                case v => throw new IllegalArgumentException(
                  s"apply_dimension callback returned $v")
              }
            val process: Column => Column =
              if (elementwise)
                arr => graft.functions.ArrayFns.arrayApply(arr,
                  x => run(Map("x" -> ColV(x), "data" -> ColV(x))))
              else
                arr => run(Map("x" -> ColV(arr), "data" -> ColV(arr),
                  "_array" -> BoolV(true)) ++ labelCtx)
            CubeV(ApplyOps.applyDimensionTarget(c, dim, process, target,
              lengthPreserving =
                args.get("length_preserving").contains(BoolV(true)) ||
                  elementwise || isLengthPreservingCallback(cbJson)))
          }
          }
        case "apply_kernel" =>
          val kern = args("kernel").asInstanceOf[ArrV].v.map(
            _.asInstanceOf[ArrV].v.map(_.asInstanceOf[NumV].v))
          CubeV(KernelOps.applyKernel(cube("data"), kern,
            args.get("factor").collect { case NumV(f) => f }.getOrElse(1.0)))
        case "reduce_dimension" =>
          val dim = str("dimension")
          if (isPlainAggregateReducer(str("reducer")))
            CubeV(ReduceOps.reduceDimension(cube("data"), dim,
              reducerCallback("reducer", order = Some(col(dim)))))
          else {
            // general openEO reducer semantics: the callback receives the
            // label-ordered value ARRAY along the reduced dimension (the
            // published EVI example indexes it with array_element); the
            // `_array` context flips the statistical reducer arms to
            // their array folds. Label-based element access needs the
            // dimension's label list — collected ONLY when the callback
            // mentions labels (metadata-scale: one distinct over the dim)
            val cbJson = str("reducer")
            val c = cube("data")
            val labelCtx: Map[String, PValue] =
              if (!cbJson.contains("\"label\"")) Map.empty
              else Map("_labels" -> ArrV(
                c.df.select(col(dim)).distinct()
                  .orderBy(col(dim)).collect().toSeq // native order = the
                  // ordered-array sort order
                  .map(r => StrV(String.valueOf(r.get(0))))))
            CubeV(ReduceOps.reduceDimensionArray(c, dim, arr =>
              runCallback(cbJson, Map("data" -> ColV(arr),
                "_array" -> BoolV(true)) ++ labelCtx ++ callbackContext) match {
                case ColV(out) => out
                case LabeledV(out) => out // labeled array result: the map
                case NumV(v) => lit(v)
                case v => throw new IllegalArgumentException(
                  s"reducer returned $v")
              }))
          }
        case "reduce_spatial" =>
          CubeV(ReduceOps.reduceSpatial(cube("data"), reducerCallback("reducer")))
        case "aggregate_temporal" =>
          val iv = args("intervals").asInstanceOf[ArrV].v.map(_.asInstanceOf[ArrV].v)
          val labels = strs("labels")
          require(iv.size == labels.size, "intervals/labels length mismatch")
          val intervals = iv.zip(labels).map { case (se, lab) =>
            AggregateOps.Interval(se(0).asInstanceOf[StrV].v,
              se(1).asInstanceOf[StrV].v, lab)
          }
          CubeV(AggregateOps.aggregateTemporal(cube("data"), intervals,
            reducerCallback("reducer"),
            opt("dimension").map(_.asInstanceOf[StrV].v)))
        case "aggregate_temporal_period" =>
          CubeV(AggregateOps.aggregateTemporalPeriod(cube("data"),
            str("period"), reducerCallback("reducer")))
        case "climatological_normal" =>
          // openEO proposal (beyond the reference): year-collapsing mean
          // per climatology key; optional climatology_period = [from, to)
          val cp = opt("climatology_period").map { _ =>
            args("climatology_period") match {
              case ArrV(Seq(StrV(from), StrV(to))) => (from, to)
              case v => throw new IllegalArgumentException(
                s"climatological_normal.climatology_period: " +
                  s"need [from, to] strings (got $v)")
            }
          }
          CubeV(AggregateOps.climatologicalNormal(cube("data"),
            str("frequency"),
            opt("dimension").map(_.asInstanceOf[StrV].v), cp))
        case "anomaly" =>
          // openEO proposal: data minus its climatological normal; the
          // normals cube broadcasts onto the fact scan
          CubeV(AggregateOps.anomaly(cube("data"), cube("normals"),
            str("frequency"),
            opt("dimension").map(_.asInstanceOf[StrV].v)))
        case "apply_neighborhood" =>
          // size/overlap arrive as raw JSON: the openeo list-of-
          // {dimension,value} form or a plain {dim: value} object
          def entry(j: JValue): Option[(String, Int)] =
            ((j \ "dimension"), (j \ "value")) match {
              case (JString(d), JInt(v)) => Some(d -> v.toInt)
              case (JString(d), JDouble(v)) => Some(d -> v.toInt)
              case _ => None
            }
          def dimMap(name: String): Map[String, Int] = opt(name) match {
            // list form reaches us as ArrV of raw-JSON objects; object form
            // as one raw-JSON string
            case Some(ArrV(xs)) => xs.flatMap {
              case StrV(j) => entry(JsonMethods.parse(j))
              case _ => None
            }.toMap
            case Some(StrV(j)) => JsonMethods.parse(j) match {
              case JArray(xs) => xs.flatMap(entry).toMap
              case JObject(fs) => fs.collect {
                case (k, JInt(v)) => k -> v.toInt
                case (k, JDouble(v)) => k -> v.toInt
              }.toMap
              case _ => Map.empty
            }
            case _ => Map.empty
          }
          val size = dimMap("size")
          val overlap = dimMap("overlap")
          CubeV(WindowOps.applyNeighborhood2D(cube("data"),
            size.getOrElse("x", 1), size.getOrElse("y", 1),
            reducerCallback("process"),
            overlap.getOrElse("x", 0), overlap.getOrElse("y", 0)))
        case "resample_spatial" =>
          // `projection` warps first (cubes/resample.py:39-113); a zero or
          // absent resolution means warp-only, no regridding
          val warped = opt("projection") match {
            case Some(StrV(p)) => ResampleOps.warpCube(cube("data"), p)
            case _ => cube("data")
          }
          val res = args.get("resolution").collect {
            case NumV(r) => r }.getOrElse(0.0)
          if (res == 0.0) CubeV(warped)
          else resampleByMethod(warped, res)
        case "run_udf" if args.get("chunked").contains(BoolV(true)) =>
          CubeV(UdfOps.runUdfChunked(cube("data"), str("udf"),
            opt("runtime").map(_.asInstanceOf[StrV].v).getOrElse("python3")))
        case "run_udf" =>
          CubeV(UdfOps.runUdf(cube("data"), str("udf"),
            opt("runtime").map(_.asInstanceOf[StrV].v).getOrElse("python3")))
        case "mask_polygon" =>
          CubeV(SpatialOps.maskPolygon(cube("data"),
            rings(str("mask")).head._2,
            if (opt("replacement").isDefined) column("replacement") else lit(null),
            inside = !args.get("inside").contains(BoolV(false))))
        case "filter_spatial" =>
          CubeV(SpatialOps.filterSpatial(cube("data"),
            rings(str("geometries")).head._2))
        case "filter_vector" =>
          // openEO proposal: keep vector-cube geometries intersecting the
          // filter polygon (three-case Column test, VectorOps.filterVector)
          TableV(VectorOps.filterVector(table("data"), "geometry",
            rings(str("geometries")).head._2))
        case "apply_polygon" =>
          CubeV(SpatialOps.applyPolygon(cube("data"),
            rings(str("polygons")).head._2, scalarCallback("process")))
        case "aggregate_spatial" =>
          val zones = rings(str("geometries"))
          val c = cube("data")
          val out = SpatialOps.aggregateSpatial(c, zones, reducerCallback("reducer"))
          val spatial = c.meta.spatialDims.toSet
          CubeV(DataCube(out, CubeMetadata(
            CubeDim("zone", DimType.Other) +:
              c.meta.dims.filterNot(d => spatial(d.name)),
            c.meta.crs, c.meta.valueCol)))
        case "line_dedup" =>
          // corpus-level CCNet line dedup over a text-valued cube: value
          // becomes the doc's surviving lines (first corpus occurrence
          // wins), cube shape preserved. The id dimension defaults to the
          // cube's first dim.
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val sep = opt("separator").map(_.asInstanceOf[StrV].v).getOrElse("\\. ")
          val deduped = graft.pipeline.Dedup.lineDedup(
            c.df, idDim, col(c.meta.valueCol), sep)
            .select(col(idDim), col("kept_text").as(c.meta.valueCol))
          val others = c.meta.dimNames.filterNot(_ == idDim)
          val joined =
            if (others.isEmpty) deduped
            else c.df.drop(c.meta.valueCol).join(deduped, Seq(idDim))
          CubeV(c.withDf(_ => joined
            .select((c.meta.dimNames.map(col) :+ col(c.meta.valueCol)): _*)))
        // ---- LLM-pipeline family as cube/table-level graph nodes ----
        // (beyond the reference, like the scalar crawl ops above: the
        // repo's flagship dedup/quality/sampling operators become
        // declaratively composable — a graph can express the full
        // load → quality → redact → dedup → pack training-data pipeline,
        // ProcessGraphSpec pins graph ≡ DataFrame-chain equivalence.)
        // All operate on a text-valued cube whose id dimension defaults to
        // the first dim (the line_dedup convention).
        case "quality_filter" =>
          // Gopher-style gate: keep docs with ≥ min_tokens whitespace
          // tokens and type-token ratio ≥ min_ttr (round-6 like the
          // pipeline_e2e chain, so graph and DataFrame gates agree on
          // boundary docs)
          val c = cube("data")
          val v = col(c.meta.valueCol)
          val minTok = args.get("min_tokens").collect {
            case NumV(x) => x }.getOrElse(1.0)
          val minTtr = args.get("min_ttr").collect {
            case NumV(x) => x }.getOrElse(0.0)
          CubeV(c.withDf(_.filter(
            graft.pipeline.TextAnalysis.tokenCount(v) >= minTok &&
              round(graft.pipeline.Repetition.typeTokenRatio(v), 6) >= minTtr)))
        case "pii_redact" =>
          val c = cube("data")
          CubeV(c.withDf(_.withColumn(c.meta.valueCol,
            graft.pipeline.TextAnalysis.redactPii(col(c.meta.valueCol)))))
        case "normalize_text" =>
          // model-ready canonicalization (NFC + Cc/Cf strip + whitespace
          // collapse + trim; TextAnalysis.normalizeText) — one codegen'd
          // scan-stage pass, cube shape preserved
          val c = cube("data")
          CubeV(c.withDf(_.withColumn(c.meta.valueCol,
            graft.pipeline.TextAnalysis.normalizeText(col(c.meta.valueCol)))))
        case "exact_dedup" =>
          // first doc per identical text survives: one md5 groupBy for the
          // survivor id set, then a semi join (AQE broadcasts it when small)
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val surv = c.df
            .groupBy(md5(col(c.meta.valueCol).cast("binary")).as("_k"))
            .agg(min(col(idDim)).as(idDim)).select(col(idDim))
          CubeV(c.withDf(_.join(surv, Seq(idDim), "left_semi")))
        case "minhash_dedup_survivors" =>
          // MinHash-LSH near-dup survivor selection through the
          // exact-dup pre-collapse path (Dedup.survivorsCollapsed)
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val th = args.get("threshold").collect {
            case NumV(x) => x }.getOrElse(0.5)
          CubeV(c.withDf(df => graft.pipeline.Dedup.survivorsCollapsed(
            df, idDim, col(c.meta.valueCol), threshold = th)))
        case "lm_score" =>
          // char-trigram LM quality scoring; `target` is an optional scalar
          // callback over the text marking the model's target distribution
          // (defaults to the whole corpus). With `max_xent` the node
          // FILTERS (text cube in, text cube out); without it the value
          // becomes the xent score.
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val v = c.meta.valueCol
          val isTarget = opt("target")
            .map(_ => scalarCallback("target")(col(v)).cast("boolean"))
            .getOrElse(lit(true))
          val scored = graft.pipeline.LanguageModel
            .charTrigramScore(c.df, idDim, col(v), isTarget)
          opt("max_xent") match {
            case Some(NumV(mx)) =>
              val keep = scored.filter(col("xent") <= mx).select(col(idDim))
              CubeV(c.withDf(_.join(keep, Seq(idDim), "left_semi")))
            case _ =>
              val x = scored.select(col(idDim), col("xent").as("_xent"))
              CubeV(c.withDf(df => df.drop(v).join(x, Seq(idDim))
                .withColumn(v, col("_xent"))
                .select((c.meta.dimNames.map(col) :+ col(v)): _*)))
          }
        case "dsir_weights" =>
          // DSIR importance weight per doc becomes the cube value; `target`
          // callback as in lm_score
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val v = c.meta.valueCol
          val isTarget = opt("target")
            .map(_ => scalarCallback("target")(col(v)).cast("boolean"))
            .getOrElse(lit(true))
          val weighted = graft.pipeline.Importance
            .dsirWeights(c.df, idDim, col(v), isTarget)
            .select(col(idDim), col("score").as("_w"))
          CubeV(c.withDf(df => df.drop(v).join(weighted, Seq(idDim))
            .withColumn(v, col("_w"))
            .select((c.meta.dimNames.map(col) :+ col(v)): _*)))
        case "split" =>
          // deterministic hash split: `fractions` = {"train":0.8,...} (raw
          // JSON), keep the named slice — shuffle-free, the 100-TB path
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val fracs = JsonMethods.parse(str("fractions")) match {
            case JObject(fs) => fs.collect {
              case (k, JDouble(d)) => k -> d
              case (k, JInt(i)) => k -> i.toDouble
              case (k, JDecimal(d)) => k -> d.toDouble
            }
            case _ => throw new IllegalArgumentException(
              "split.fractions: need a {name: fraction} object")
          }
          val salt = opt("salt").map(_.asInstanceOf[StrV].v)
            .getOrElse("graft-split")
          CubeV(c.withDf(_.filter(graft.pipeline.Sampling
            .splitColumn(col(idDim), salt, fracs) === str("keep"))))
        case "sample" =>
          // proportional-in-expectation hash sample, shuffle-free
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val salt = opt("salt").map(_.asInstanceOf[StrV].v)
            .getOrElse("graft-sample")
          CubeV(c.withDf(df => graft.pipeline.Sampling.sampleByHash(
            df, idDim, num("fraction"), salt)))
        case "pack_sequences" =>
          // terminal packing node: the cube becomes the packing table
          // (id, n_tok, bin, offset_in_bin) with offset_in_bin as value —
          // the exact shape the pack_sequences driver query emits
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val budget = num("budget").toInt
          val nBuckets = args.get("buckets").collect {
            case NumV(x) => x.toInt }.getOrElse(256)
          val packed = graft.pipeline.Sampling.packSequences(c.df, idDim,
            graft.pipeline.TextAnalysis.tokenCount(col(c.meta.valueCol)),
            budget, nBuckets)
          CubeV(DataCube(packed, CubeMetadata(Seq(
            CubeDim(idDim, DimType.Other),
            CubeDim("n_tok", DimType.Other),
            CubeDim("bin", DimType.Other)), None, "offset_in_bin")))
        case "simhash_dedup_survivors" =>
          // SimHash near-dup survivor selection: pigeonhole-chunk candidate
          // pairs within `max_hamming` (Dedup.simhashNearDups — lossless
          // equi-join banding, no all-pairs), then the standard
          // component-minimum survivor anti-join
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val maxHam = args.get("max_hamming").collect {
            case NumV(x) => x.toInt }.getOrElse(3)
          CubeV(c.withDf { df =>
            val pairs = graft.pipeline.Dedup.simhashNearDups(
              df, idDim, col(c.meta.valueCol), Seq.empty, maxHam)
            graft.pipeline.Dedup.survivors(df, idDim, pairs)
          })
        case "ngram_jaccard_dedup" =>
          // exact n-gram-Jaccard near-dup survivors: PPJoin prefix-filtered
          // candidate pairs above `threshold` (Dedup.ngramJaccardNearDups),
          // then the component-minimum survivor anti-join
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val n = args.get("n").collect { case NumV(x) => x.toInt }.getOrElse(3)
          val th = args.get("threshold").collect {
            case NumV(x) => x }.getOrElse(0.5)
          CubeV(c.withDf { df =>
            val pairs = graft.pipeline.Dedup.ngramJaccardNearDups(
              df, idDim, col(c.meta.valueCol), Seq.empty, n, th)
            graft.pipeline.Dedup.survivors(df, idDim, pairs)
          })
        case "decontaminate" =>
          // benchmark decontamination against a second cube input: per-doc
          // n-gram containment of `data`'s text in `train`'s distinct
          // shingle set (Dedup.ngramContainment). With `max_containment`
          // the node FILTERS data (text cube in, text cube out); without it
          // the value becomes the containment score — the lm_score
          // two-mode convention.
          val c = cube("data")
          val tr = cube("train")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val n = args.get("n").collect { case NumV(x) => x.toInt }.getOrElse(3)
          val v = c.meta.valueCol
          val scored = graft.pipeline.Dedup.ngramContainment(
            tr.df.select(col(tr.meta.dimNames.head).as(idDim),
              col(tr.meta.valueCol).as(v)),
            c.df.select(col(idDim), col(v)), idDim, col(v), n)
          opt("max_containment") match {
            case Some(NumV(mc)) =>
              // anti-join on the over-limit set (not semi on the keep set):
              // docs too short to yield a shingle have no containment row
              // and must be KEPT, not silently dropped
              val drop = scored.filter(col("containment") > mc)
                .select(col(idDim))
              CubeV(c.withDf(_.join(drop, Seq(idDim), "left_anti")))
            case _ =>
              val x = scored.select(col(idDim), col("containment").as("_ct"))
              CubeV(c.withDf(df => df.drop(v).join(x, Seq(idDim), "left")
                .withColumn(v, coalesce(col("_ct"), lit(0.0)))
                .select((c.meta.dimNames.map(col) :+ col(v)): _*)))
          }
        case "incremental_dedup" =>
          // keep only `data` docs whose content key is absent from the
          // `corpus` cube — bloom-prefiltered exact anti-join
          // (Dedup.incrementalNew: the corpus never shuffles)
          val c = cube("data")
          val corp = cube("corpus")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val keyOf: Column => Column = opt("key")
            .map(_ => scalarCallback("key"))
            .getOrElse(graft.pipeline.TextAnalysis.contentHash(_))
          val expected = args.get("expected_keys").collect {
            case NumV(x) => x.toLong }.getOrElse(1L << 20)
          CubeV(c.withDf(df => graft.pipeline.Dedup.incrementalNew(
            df, corp.df.select(col(corp.meta.valueCol).as(c.meta.valueCol)),
            idDim, keyOf(col(c.meta.valueCol)), expected)))
        case "semdedup" =>
          // SemDeDup over an embedding-valued cube (value = Array[Float]):
          // IVF-bucketed cosine near-dup pairs above `threshold`, then the
          // component-minimum survivor anti-join — the embedding twin of
          // minhash_dedup_survivors
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val th = args.get("threshold").collect {
            case NumV(x) => x }.getOrElse(0.95)
          val cents = args.get("centroids").collect {
            case NumV(x) => x.toInt }.getOrElse(16)
          CubeV(c.withDf(df => graft.pipeline.Similarity.semDedupSurvivors(
            df, idDim, c.meta.valueCol, th, cents)))
        case "bm25" =>
          // BM25 lexical retrieval over a text-valued cube
          // (pipeline.Retrieval.bm25TopK): terminal node — the cube
          // becomes the (id) → score_units top-k table, exact integer
          // micro-unit scores, TakeOrdered top-k
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val terms = args.get("query") match {
            case Some(ArrV(xs)) => xs.map {
              case StrV(t) => t
              case v => throw new IllegalArgumentException(
                s"bm25.query: not a string ($v)")
            }
            case other => throw new IllegalArgumentException(
              s"bm25.query: required string array (got $other)")
          }
          val k = args.get("k").collect { case NumV(x) => x.toInt }.getOrElse(10)
          val top = graft.pipeline.Retrieval.bm25TopK(
            c.df.select(col(idDim), col(c.meta.valueCol).as("_text")),
            terms, k, idCol = idDim, textCol = "_text")
          CubeV(DataCube(top, CubeMetadata(
            Seq(CubeDim(idDim, DimType.Other)), None, "score_units")))
        case "page_rank" =>
          // PageRank over an edge-list cube (first dim = src node, value =
          // dst node; pipeline.LinkGraph.pageRank): terminal node — the
          // cube becomes the node → rank_units table, exact integer-unit
          // mass, damping 0.85
          val c = cube("data")
          val iters = args.get("iterations").collect {
            case NumV(x) => x.toInt }.getOrElse(3)
          val edges = c.df.select(
            col(c.meta.dimNames.head).cast("string").as("src"),
            col(c.meta.valueCol).cast("string").as("dst"))
          val ranks = graft.pipeline.LinkGraph.pageRank(edges, iters)
          CubeV(DataCube(ranks, CubeMetadata(
            Seq(CubeDim("node", DimType.Other)), None, "rank_units")))
        case "ann_topk" =>
          // approximate top-k neighbors of a `queries` cube against a
          // `corpus` cube (both embedding-valued): terminal node — the
          // cube becomes the (query_id, rank) -> neighbor table with
          // cosine as the value
          val qc = cube("queries")
          val cc = cube("corpus")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(qc.meta.dimNames.head)
          qc.requireDim(idDim)
          val k = args.get("k").collect { case NumV(x) => x.toInt }.getOrElse(10)
          val cents = args.get("centroids").collect {
            case NumV(x) => x.toInt }.getOrElse(16)
          val corpusDf = cc.df.select(
            col(cc.meta.dimNames.head).as(idDim),
            col(cc.meta.valueCol).as(qc.meta.valueCol))
          val centroids = graft.pipeline.Similarity.strideCentroids(
            corpusDf, idDim, qc.meta.valueCol, cents)
          val top = graft.pipeline.Similarity.ivfTopK(
            qc.df.select(col(idDim), col(qc.meta.valueCol)), corpusDf,
            idDim, qc.meta.valueCol, centroids, k)
            .select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
          CubeV(DataCube(top, CubeMetadata(Seq(
            CubeDim("query_id", DimType.Other),
            CubeDim("neighbor_id", DimType.Other),
            CubeDim("rk", DimType.Other)), None, "cos")))
        case "pq_topk" =>
          // product-quantized top-k in its production refine shape
          // (codebook trained on the corpus, ADC shortlist from the
          // compressed codes, exact-cosine re-rank): same terminal
          // (query_id, neighbor_id, rk) -> cosine table as ann_topk
          val qc = cube("queries")
          val cc = cube("corpus")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(qc.meta.dimNames.head)
          qc.requireDim(idDim)
          val k = args.get("k").collect { case NumV(x) => x.toInt }.getOrElse(10)
          val dims = num("dims").toInt
          val m = args.get("m").collect { case NumV(x) => x.toInt }.getOrElse(16)
          val cents = args.get("centroids").collect {
            case NumV(x) => x.toInt }.getOrElse(32)
          val shortlist = args.get("shortlist").collect {
            case NumV(x) => x.toInt }.getOrElse(math.max(25, 5 * k))
          val corpusDf = cc.df.select(
            col(cc.meta.dimNames.head).as(idDim),
            col(cc.meta.valueCol).as(qc.meta.valueCol))
          val book = graft.pipeline.Similarity.pqCodebook(
            corpusDf, idDim, qc.meta.valueCol, dims, m, cents)
          val qDf = qc.df.select(col(idDim), col(qc.meta.valueCol))
          // with `probes` set, the IVFADC composition bounds the ADC scan
          // to the probed coarse cells (`coarse_centroids`, default 16)
          val top = (args.get("probes").collect { case NumV(x) => x.toInt }
            match {
              case Some(pr) =>
                val coarse = args.get("coarse_centroids").collect {
                  case NumV(x) => x.toInt }.getOrElse(16)
                val ivf = graft.pipeline.Similarity.strideCentroids(
                  corpusDf, idDim, qc.meta.valueCol, coarse)
                graft.pipeline.Similarity.ivfPqTopK(qDf, corpusDf,
                  idDim, qc.meta.valueCol, ivf, book, k, shortlist, pr)
              case None =>
                graft.pipeline.Similarity.pqTopKRefined(qDf, corpusDf,
                  idDim, qc.meta.valueCol, book, k, shortlist)
            }).select(col("query_id"), col("neighbor_id"), col("rk"), col("cos"))
          CubeV(DataCube(top, CubeMetadata(Seq(
            CubeDim("query_id", DimType.Other),
            CubeDim("neighbor_id", DimType.Other),
            CubeDim("rk", DimType.Other)), None, "cos")))
        case "fuzzy_join" =>
          // R-S similarity join between two text cubes: terminal node —
          // the cube becomes the (id_l, id_r) → jaccard pair table
          val lc = cube("data")
          val rc = cube("right")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(lc.meta.dimNames.head)
          lc.requireDim(idDim)
          val th = args.get("threshold").collect {
            case NumV(x) => x }.getOrElse(0.5)
          val n = args.get("n").collect { case NumV(x) => x.toInt }.getOrElse(3)
          val joined = graft.pipeline.Dedup.jaccardJoin(
            lc.df.select(col(idDim), col(lc.meta.valueCol)),
            rc.df.select(col(rc.meta.dimNames.head).as(idDim),
              col(rc.meta.valueCol).as(lc.meta.valueCol)),
            idDim, col(lc.meta.valueCol), n, th)
          CubeV(DataCube(joined, CubeMetadata(Seq(
            CubeDim("id_l", DimType.Other),
            CubeDim("id_r", DimType.Other)), None, "jaccard")))
        case "chunk_docs" =>
          // overlapping token-window chunking: the id dimension gains a
          // chunk_id companion and the value becomes the chunk text —
          // the context-window prep step of the training pipeline
          val c = cube("data")
          val idDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse(c.meta.dimNames.head)
          c.requireDim(idDim)
          val window = num("window").toInt
          val stride = args.get("stride").collect {
            case NumV(x) => x.toInt }.getOrElse(window)
          val chunked = graft.pipeline.Chunking.chunkDocs(
            c.df, idDim, col(c.meta.valueCol), window, stride)
            .withColumnRenamed("chunk", c.meta.valueCol)
          CubeV(DataCube(chunked, CubeMetadata(Seq(
            CubeDim(idDim, DimType.Other),
            CubeDim("chunk_id", DimType.Other)), None, c.meta.valueCol)))
        case "heavy_hitters" =>
          // SpaceSaving top-k frequency sketch over the cube's values:
          // terminal node — (rank, key) → count table, O(capacity) state,
          // no key-space shuffle (functions.SpaceSavingAgg)
          val c = cube("data")
          val capacity = args.get("capacity").collect {
            case NumV(x) => x.toInt }.getOrElse(8192)
          val k = args.get("k").collect { case NumV(x) => x.toInt }.getOrElse(20)
          val hh = c.df.filter(col(c.meta.valueCol).isNotNull)
            .agg(graft.functions.SpaceSavingAgg.column(
              col(c.meta.valueCol).cast("string"), capacity, k).as("hh"))
            .select(posexplode(col("hh")).as(Seq("rank", "e")))
            .select(col("rank"), col("e.key").as("key"),
              col("e.count").as("count"))
          CubeV(DataCube(hh, CubeMetadata(Seq(
            CubeDim("rank", DimType.Other),
            CubeDim("key", DimType.Other)), None, "count")))
        case "top_k" =>
          // bounded-heap top-k rows by VALUE (functions.TopKAgg): the
          // ranking sibling of heavy_hitters (which ranks by FREQUENCY).
          // Terminal node — per `group` label (or globally), the k
          // highest-valued cells identified by `id_dimension`'s numeric
          // labels; one map-side-combinable pass, O(k) per (group,
          // partition), vs a full-table shuffle + per-group sort for a
          // row_number() window
          val c = cube("data")
          val k = args.get("k").collect {
            case NumV(x) => x.toInt }.getOrElse(3)
          val idDim = str("id_dimension")
          val groupDim = opt("group").map {
            case StrV(s) => s
            case v => throw new IllegalArgumentException(
              s"top_k.group: not a string ($v)")
          }
          val dimNames = c.meta.dims.map(_.name).toSet
          (groupDim.toSeq :+ idDim).foreach { d =>
            require(dimNames.contains(d),
              s"DimensionNotAvailable: top_k dimension '$d' not in cube " +
                s"(${dimNames.mkString(", ")})")
          }
          val idL = col(idDim).cast("long")
          val grouped = c.df
            .filter(col(c.meta.valueCol).isNotNull && idL.isNotNull)
            .groupBy(groupDim.map(col).toSeq: _*)
            .agg(graft.functions.TopKAgg.column(
              col(c.meta.valueCol).cast("double"), idL, k).as("top"))
          val outCols = groupDim.map(col).toSeq ++ Seq(
            (col("pos") + 1).cast("long").as("rank"),
            col("e.id").as(idDim), col("e.v").as(c.meta.valueCol))
          val tk = grouped
            .select(groupDim.map(col).toSeq :+
              posexplode(col("top")).as(Seq("pos", "e")): _*)
            .select(outCols: _*)
          CubeV(DataCube(tk, CubeMetadata(
            groupDim.map(g => CubeDim(g, DimType.Other)).toSeq ++ Seq(
              CubeDim("rank", DimType.Other),
              CubeDim(idDim, DimType.Other)), None, c.meta.valueCol)))
        case "quantiles_sketch" =>
          // GK weighted-quantile sketch over the cube's numeric values,
          // quantized by `scale` (distribution without the data-sized
          // sort; functions.QuantileSketchAgg): terminal node — the
          // per-mille probe table (pm) → quantized value
          val c = cube("data")
          val capacity = args.get("capacity").collect {
            case NumV(x) => x.toInt }.getOrElse(16384)
          val scale = args.get("scale").collect {
            case NumV(x) => x }.getOrElse(10.0)
          val probes = opt("permille").map {
            case ArrV(xs) => xs.map {
              case NumV(x) => x.toInt
              case v => throw new IllegalArgumentException(
                s"quantiles_sketch.permille: not a number ($v)")
            }
            case v => throw new IllegalArgumentException(
              s"quantiles_sketch.permille: not an array ($v)")
          }.getOrElse(graft.functions.QuantileSketchAgg.DefaultPms)
          val qp = c.df.filter(col(c.meta.valueCol).isNotNull)
            .agg(graft.functions.QuantileSketchAgg.column(
              round(col(c.meta.valueCol) * scale).cast("long"), lit(1L),
              capacity, probes).as("qp"))
            .select(explode(col("qp")).as("e"))
            .select(col("e.pm").as("pm"), col("e.v").as("v"))
          CubeV(DataCube(qp, CubeMetadata(Seq(
            CubeDim("pm", DimType.Other)), None, "v")))
        case "distinct_count" =>
          // KMV/theta cardinality sketch over the cube's values
          // (functions.ThetaSketchAgg): terminal node — a one-row
          // (metric) → estimate table; exact while distinct ≤ k
          val c = cube("data")
          val k = args.get("k").collect {
            case NumV(x) => x.toInt }.getOrElse(16384)
          val dc = c.df.filter(col(c.meta.valueCol).isNotNull)
            .agg(graft.functions.ThetaSketchAgg.column(
              xxhash64(col(c.meta.valueCol).cast("string")), k).as("sk"))
            .select(lit("distinct").as("metric"),
              graft.functions.ThetaSketchAgg.estimateUdf(k)(col("sk")).as("n"))
          CubeV(DataCube(dc, CubeMetadata(Seq(
            CubeDim("metric", DimType.Other)), None, "n")))
        case "set_overlap" =>
          // cross-set overlap of two cubes' value sets from KMV/theta
          // sketches: terminal node — long-form (metric) → value table
          // (n_a, n_b, n_common, jaccard_ppm); the sketches meet on a
          // one-row frame, never the data
          val a = cube("data")
          val b = cube("right")
          val k = args.get("k").collect {
            case NumV(x) => x.toInt }.getOrElse(16384)
          val skA = a.df.filter(col(a.meta.valueCol).isNotNull)
            .agg(graft.functions.ThetaSketchAgg.column(
              xxhash64(col(a.meta.valueCol).cast("string")), k).as("a_sk"))
          val skB = b.df.filter(col(b.meta.valueCol).isNotNull)
            .agg(graft.functions.ThetaSketchAgg.column(
              xxhash64(col(b.meta.valueCol).cast("string")), k).as("b_sk"))
          val st = skA.crossJoin(skB) // two one-row frames by construction
            .withColumn("st", graft.functions.ThetaSketchAgg.pairStatsUdf(k)(
              col("a_sk"), col("b_sk")))
          val longForm = st.select(explode(map(
            lit("n_a"), col("st._1"), lit("n_b"), col("st._2"),
            lit("n_common"), col("st._3"), lit("jaccard_ppm"), col("st._4")))
            .as(Seq("metric", "v")))
          CubeV(DataCube(longForm, CubeMetadata(Seq(
            CubeDim("metric", DimType.Other)), None, "v")))

        case "drop_dimension" =>
          CubeV(CubeDimOps.dropDimension(cube("data"), str("name")))
        case "rename_dimension" =>
          CubeV(CubeDimOps.renameDimension(cube("data"), str("source"), str("target")))
        case "flatten_dimensions" =>
          // openEO spec proposal (beyond the reference's exports): combine
          // dimensions into one, labels joined by label_separator
          CubeV(CubeDimOps.flattenDimensions(cube("data"), strs("dimensions"),
            str("target_dimension"),
            opt("label_separator").map {
              case StrV(s) => s
              case v => throw new IllegalArgumentException(
                s"flatten_dimensions.label_separator: not a string ($v)")
            }.getOrElse("~")))
        case "unflatten_dimension" =>
          // openEO spec proposal: split a dimension's labels back out
          CubeV(CubeDimOps.unflattenDimension(cube("data"), str("dimension"),
            strs("target_dimensions"),
            opt("label_separator").map {
              case StrV(s) => s
              case v => throw new IllegalArgumentException(
                s"unflatten_dimension.label_separator: not a string ($v)")
            }.getOrElse("~")))
        case "aggregate_spatial_window" =>
          // openEO spec proposal: reduce over non-overlapping pixel
          // windows; size = [x, y], boundary pad|trim
          val size = args.get("size") match {
            case Some(ArrV(Seq(NumV(sx), NumV(sy)))) => (sx.toInt, sy.toInt)
            case v => throw new IllegalArgumentException(
              s"aggregate_spatial_window.size: need [x, y] numbers ($v)")
          }
          CubeV(SpatialOps.aggregateSpatialWindow(cube("data"),
            reducerCallback("reducer"), size._1, size._2,
            opt("boundary").map {
              case StrV(s) => s
              case v => throw new IllegalArgumentException(
                s"aggregate_spatial_window.boundary: not a string ($v)")
            }.getOrElse("pad")))
        case "save_result" =>
          // The terminal node every canonical openeo graph ends with.
          // Backend-defined in the reference (absent from its process
          // library); here the native sink is partitioned parquet: with an
          // options.path the result is written eagerly (save_result IS the
          // action), without one it is a pass-through so callers can sink
          // the returned cube themselves.
          val c = cube("data")
          val fmt = opt("format").map(_.asInstanceOf[StrV].v).getOrElse("Parquet")
          require(Set("parquet", "csv", "json", "gtiff", "geotiff", "zarr",
            "zarr3")(fmt.toLowerCase),
            s"FormatUnsuitable: $fmt (parquet, csv, json, gtiff, zarr, zarr3)")
          val pathOpt = opt("options").flatMap {
            case StrV(j) => JsonMethods.parse(j) \ "path" match {
              case JString(p) => Some(p)
              case _ => None
            }
            case _ => None
          }
          pathOpt.foreach(p =>
            graft.sources.CubeIO.saveResult(c, p, format = fmt))
          CubeV(c)
        case "inspect" =>
          CubeV(graft.sources.CubeIO.inspect(cube("data"),
            opt("message").map(_.asInstanceOf[StrV].v).getOrElse(""),
            opt("code").map(_.asInstanceOf[StrV].v).getOrElse("User"),
            opt("level").map(_.asInstanceOf[StrV].v).getOrElse("info")))
        case "trim_cube" =>
          CubeV(CubeDimOps.trimCube(cube("data"), strs("dimensions")))
        case "merge_cubes" =>
          // The overlap_resolver is itself a process graph over (x, y); compile
          // it into a binary Column builder. When absent, pass None so MergeOps
          // raises OverlapResolverMissing on overlap (reference: merge.py:165-168).
          val resolver: Option[(Column, Column) => Column] =
            opt("overlap_resolver").map { _ =>
              val cbJson = str("overlap_resolver")
              (a: Column, b: Column) =>
                runCallback(cbJson, Map("x" -> ColV(a), "y" -> ColV(b),
                    "cube1" -> ColV(a), "cube2" -> ColV(b))
                    ++ callbackContext) match {
                  case ColV(out) => out
                  case NumV(v) => lit(v)
                  case v => throw new IllegalArgumentException(s"resolver returned $v")
                }
            }
          CubeV(MergeOps.mergeCubes(cube("cube1"), cube("cube2"), resolver))
        case "mask" =>
          CubeV(MergeOps.mask(cube("data"), cube("mask"),
            if (opt("replacement").isDefined) column("replacement") else lit(null)))
        case "add_dimension" =>
          CubeV(CubeDimOps.addDimension(cube("data"), str("name"), str("label")))
        case "rename_labels" =>
          // CHECKED form: the reference's full typed-error contract
          // (LabelMismatch / LabelExists / LabelNotAvailable /
          // LabelsNotEnumerated) validated against the dimension's label
          // set — one pruned metadata-scale distinct, like the reference's
          // coords lookup (cubes/general.py:150-222)
          CubeV(CubeDimOps.renameLabelsChecked(cube("data"), str("dimension"),
            strs("target"),
            opt("source").map(_ => strs("source")).getOrElse(Nil)))
        case "ndvi" =>
          CubeV(IndicesOps.ndvi(cube("data"),
            opt("nir").map(_.asInstanceOf[StrV].v).getOrElse("nir"),
            opt("red").map(_.asInstanceOf[StrV].v).getOrElse("red"),
            opt("target_band").map(_.asInstanceOf[StrV].v)))

        // ---- curve fitting / ML (reference: ml/curve_fitting.py:15-162,
        // ml/random_forest.py:22-161) ----
        case "fit_curve" =>
          // The reference's `function` argument is an arbitrary scipy
          // callback; the engine's closed-form fitter covers the models
          // that are linear in their parameters — `linear` (a + b·x) and
          // the reference's CANONICAL seasonal `harmonic`
          // (a + b·sin(ωx) + c·cos(ωx)) — selected by `model`. The result
          // is the openEO shape: the fitted dimension is replaced by a
          // `param` dimension with labels a/b(/c).
          val c = cube("data"); val dim = str("dimension")
          val model = opt("model").map(_.asInstanceOf[StrV].v)
            .getOrElse("linear")
          val others = c.meta.dimNames.filterNot(_ == dim)
          val params = model match {
            case "linear" => (CurveOps.fitLinear(c, dim), Seq("a", "b"))
            case "harmonic" =>
              (CurveOps.fitHarmonic(c, dim, num("omega")), Seq("a", "b", "c"))
            case m => throw new IllegalArgumentException(
              s"ProcessUnsupported: fit_curve model $m (linear, harmonic)")
          }
          val (pdf, names) = params
          val kv = names.flatMap(n => Seq(lit(n), col(n)))
          val melted = pdf
            .select((others.map(col) :+ explode(map(kv: _*))): _*)
            .withColumnRenamed("key", "param")
          CubeV(DataCube.fromTable(melted, others :+ "param", "value"))
        case "predict_curve" =>
          val pc = cube("parameters"); val dimName = str("dimension")
          val labels = args("labels").asInstanceOf[ArrV].v
            .map(_.asInstanceOf[NumV].v)
          val model = opt("model").map(_.asInstanceOf[StrV].v)
            .getOrElse("linear")
          val series = pc.meta.dimNames.filterNot(_ == "param")
          val v = pc.meta.valueCol
          def wide(names: Seq[String]) =
            pc.df.groupBy(series.map(col): _*).agg(
              max(when(col("param") === names.head, col(v))).as(names.head),
              names.tail.map(n =>
                max(when(col("param") === n, col(v))).as(n)): _*)
          val out = model match {
            case "linear" =>
              CurveOps.predictLinear(wide(Seq("a", "b")), series, labels, dimName)
            case "harmonic" =>
              val w = num("omega")
              CurveOps.predictBasis2(wide(Seq("a", "b", "c")), series, labels,
                x => sin(x * w), x => cos(x * w), dimName)
            case m => throw new IllegalArgumentException(
              s"ProcessUnsupported: predict_curve model $m (linear, harmonic)")
          }
          CubeV(DataCube.fromTable(out, series :+ dimName, "value"))
        case "fit_regr_random_forest" =>
          // `predictors`: cube whose `dimension` (default bands) labels
          // are the feature names; `target`: cube over the same series
          // dims. The band pivot is a #features-wide reshape; the label
          // collect is metadata-scale (feature count), same class as dim
          // labels. Training itself is MLlib's distributed forest.
          val pred = cube("predictors"); val tgt = cube("target")
          val bandDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse("bands")
          pred.requireDim(bandDim)
          val series = pred.meta.dimNames.filterNot(_ == bandDim)
          val feats = pred.df.select(col(bandDim).cast("string"))
            .distinct().collect().map(_.getString(0)).sorted.toSeq
          val wide = pred.df.groupBy(series.map(col): _*)
            .pivot(bandDim, feats).agg(first(col(pred.meta.valueCol)))
          val joined = wide.join(
            tgt.df.select((series.map(col) :+
              col(tgt.meta.valueCol).as("_target")): _*), series)
          val numTrees = opt("num_trees").map(_.asInstanceOf[NumV].v.toInt)
            .getOrElse(100)
          val maxDepth = opt("max_depth").map(_.asInstanceOf[NumV].v.toInt)
            .getOrElse(8)
          val seed = opt("seed").map(_.asInstanceOf[NumV].v.toLong)
            .getOrElse(42L)
          ModelV(MLOps.fitRandomForest(joined, feats, "_target",
            numTrees, maxDepth, seed), feats)
        case "fit_class_random_forest" =>
          // openEO ML proposal (beyond the reference's exports — the
          // reference ships only the regressor): target labels are class
          // indices 0..k−1; same band pivot and reproducibility contract
          // as fit_regr_random_forest
          val pred = cube("predictors"); val tgt = cube("target")
          val bandDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse("bands")
          pred.requireDim(bandDim)
          val series = pred.meta.dimNames.filterNot(_ == bandDim)
          val feats = pred.df.select(col(bandDim).cast("string"))
            .distinct().collect().map(_.getString(0)).sorted.toSeq
          val wide = pred.df.groupBy(series.map(col): _*)
            .pivot(bandDim, feats).agg(first(col(pred.meta.valueCol)))
          val joined = wide.join(
            tgt.df.select((series.map(col) :+
              col(tgt.meta.valueCol).as("_target")): _*), series)
          val numTrees = opt("num_trees").map(_.asInstanceOf[NumV].v.toInt)
            .getOrElse(100)
          val maxDepth = opt("max_depth").map(_.asInstanceOf[NumV].v.toInt)
            .getOrElse(8)
          val seed = opt("seed").map(_.asInstanceOf[NumV].v.toLong)
            .getOrElse(42L)
          ModelV(MLOps.fitClassRandomForest(joined, feats, "_target",
            numTrees, maxDepth, seed), feats)
        case "save_ml_model" =>
          // openEO ML proposal (beyond the reference's exports): persist a
          // fitted model + feature-order sidecar; pass-through like
          // save_result so a graph can save AND keep predicting
          val mv = args("model") match {
            case m: ModelV => m
            case v => throw new IllegalArgumentException(
              s"ModelNotFound: save_ml_model's `model` is not a model ($v)")
          }
          MLOps.saveModel(mv.model, mv.features, str("path"))
          mv
        case "load_ml_model" =>
          // openEO ML proposal: `id` is the backend-storage handle — here
          // the save_ml_model directory path
          val (m, f) = MLOps.loadModel(str("id"))
          ModelV(m, f)
        case "predict_random_forest" =>
          val (model, feats) = args("model") match {
            case ModelV(m, f) => (m, f)
            case v => throw new IllegalArgumentException(
              "ModelNotFound: predict_random_forest's `model` does not " +
                s"resolve to a loaded ML model ($v)") // exceptions.py:45
          }
          val d = cube("data")
          val bandDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse("bands")
          d.requireDim(bandDim)
          val series = d.meta.dimNames.filterNot(_ == bandDim)
          val wide = d.df.groupBy(series.map(col): _*)
            .pivot(bandDim, feats).agg(first(col(d.meta.valueCol)))
          val scored = MLOps.predictForest(model, wide, feats)
          CubeV(DataCube.fromTable(
            scored.withColumn("value", col("prediction")), series, "value"))

        // ---- cube-to-cube resample (reference: cubes/resample.py) ----
        case "resample_cube_spatial" =>
          val d = cube("data"); val t = cube("target")
          val method = opt("method").map(_.asInstanceOf[StrV].v)
            .getOrElse("near")
          method match {
            case "near" =>
              // target axis labels: metadata-scale collects (axis lengths)
              val sd = t.meta.spatialDims
              require(sd.size == 2,
                s"DimensionMissing: target has spatial dims $sd (need 2)")
              def labels(dim: String): Seq[Double] =
                t.df.select(col(dim).cast("double")).distinct()
                  .collect().map(_.getDouble(0)).sorted.toSeq
              CubeV(SpatialOps.resampleCubeSpatialNear(d,
                labels(sd.head), labels(sd(1)), v => Reducers.meanR(v)))
            case "bilinear" =>
              CubeV(ResampleOps.resampleCubeSpatialBilinear(d, t))
            case m => throw new IllegalArgumentException(
              s"ProcessUnsupported: resample_cube_spatial method $m (near, bilinear)")
          }
        case "resample_cube_temporal" =>
          val d = cube("data"); val t = cube("target")
          val dim = opt("dimension").map(_.asInstanceOf[StrV].v)
          val tdim = dim.getOrElse(t.temporalDim)
          // target time labels: metadata-scale collect (axis length)
          val targets = t.df.select(col(tdim).cast("timestamp")).distinct()
            .collect().map(_.getTimestamp(0)).sortBy(_.getTime).toSeq
          CubeV(ResampleOps.resampleCubeTemporal(d, targets, dim,
            opt("valid_within").map(_.asInstanceOf[NumV].v)))

        // ---- cumulative processes (reference: cubes/cummax.py etc. —
        // cube-level along a dimension, like the reference's dim-aware
        // wrappers over the array forms) ----
        // Dual-form like the statistical reducers: over a cube they are
        // window functions along `dimension`; inside an ordered-array
        // callback (`data` arrives as a ColV series array) they are the
        // ArrayFns folds — dispatch on the argument, not the context, so
        // they work in every array-callback site.
        case "cumsum" => args("data") match {
          case ColV(a) => ColV(graft.functions.ArrayFns.arrayCumsum(a))
          case _ => CubeV(WindowOps.cumsum(cube("data"), str("dimension")))
        }
        case "cummin" => args("data") match {
          case ColV(a) => ColV(graft.functions.ArrayFns.arrayCummin(a))
          case _ => CubeV(WindowOps.cummin(cube("data"), str("dimension")))
        }
        case "cummax" => args("data") match {
          case ColV(a) => ColV(graft.functions.ArrayFns.arrayCummax(a))
          case _ => CubeV(WindowOps.cummax(cube("data"), str("dimension")))
        }
        case "cumproduct" => args("data") match {
          case ColV(a) => ColV(graft.functions.ArrayFns.arrayCumproduct(a))
          case _ => CubeV(WindowOps.cumprodExact(cube("data"), str("dimension")))
        }
        case "array_interpolate_linear" => args("data") match {
          case ColV(a) =>
            ColV(graft.functions.ArrayFns.arrayInterpolateLinear(a))
          case _ =>
            // dim-aware form (the array form is this along `dimension`)
            CubeV(WindowOps.interpolateLinear(cube("data"), str("dimension")))
        }

        // ---- labeled-array scalar processes ----
        case "array_create_labeled" =>
          LabeledV(graft.functions.ArrayFns.arrayCreateLabeled(
            column("data"), column("labels")))
        case "array_find_label" =>
          ColV(graft.functions.ArrayFns.arrayFindLabel(
            column("data"), column("label")))

        // ---- dimension metadata / constructors ----
        case "dimension_labels" =>
          TableV(CubeDimOps.dimensionLabels(cube("data"), str("dimension")))
        case "create_data_cube" =>
          CubeV(graft.sources.CubeIO.createDataCube(
            org.apache.spark.sql.SparkSession.active))

        // ---- domain composites (reference: experimental/ddmc.py:8-84,
        // experimental/rqadeforestation.py) ----
        case "ddmc" =>
          // generalized band-difference composite: `pairs` maps each output
          // band to its [minuend, subtrahend] input bands (the reference
          // hard-codes the MNDWI/NDVI/... set; the math is identical)
          val c = cube("data")
          val bandDim = opt("dimension").map(_.asInstanceOf[StrV].v)
            .getOrElse("band")
          val pairsJson = JsonMethods.parse(str("pairs"))
          val pairs = pairsJson match {
            case JObject(fields) => fields.map {
              case (name, JArray(Seq(JString(a), JString(b)))) => name -> (a, b)
              case (name, v) => throw new IllegalArgumentException(
                s"ddmc.pairs.$name: expected [bandA, bandB], got $v")
            }
            case v => throw new IllegalArgumentException(s"ddmc.pairs: $v")
          }
          CubeV(CompositeOps.bandDifferenceComposite(c, bandDim, pairs))
        case "rqadeforestation" =>
          TableV(WindowOps.recurrenceRate(cube("data"), str("dimension"),
            num("eps"), num("max_lag").toInt))

        // ---- vector processes (reference: vector/buffer.py,
        // vector/reproject.py) ----
        case "vector_buffer" =>
          // buffer point geometries; polygon rows pass through unchanged
          // (the point-ring buffer is the op the engine implements).
          // UnitMismatch (reference geometries.py:127-135): when the
          // vector frame CARRIES a crs column and ANY row is geographic,
          // the meter distance has the wrong unit — probed as an
          // existence filter (deterministic on mixed-CRS tables, unlike
          // an arbitrary first-row sample) at metadata scale
          val df = table("geometries")
          val dist = num("distance")
          if (df.columns.contains("crs")) {
            val geographic = df
              .filter(col("crs").isin("EPSG:4326", "OGC:CRS84"))
              .limit(1).collect().nonEmpty
            if (geographic) throw new IllegalArgumentException(
              "UnitMismatch: the unit of the spatial reference system is " +
                "not meters, but the given distance is in meters")
          }
          val pts = VectorOps.bufferPoints(
            df.filter(col("geom_type") === "Point"), "geometry", dist)
          TableV(pts.unionByName(df.filter(col("geom_type") =!= "Point")))
        case "vector_to_regular_points" =>
          // openEO spec proposal (beyond the reference's exports): regular
          // distance-spaced sample points inside each polygon; points
          // pass through
          TableV(VectorOps.vectorToRegularPoints(table("data"), "geometry",
            num("distance")))
        case "vector_to_random_points" =>
          // openEO spec proposal (beyond the reference's exports): up to
          // `geometry_count` seeded pseudo-random points per polygon
          // (md5-derived, deterministic); points pass through
          TableV(VectorOps.vectorToRandomPoints(table("data"), "geometry",
            num("geometry_count").toInt,
            seed = opt("seed").map(_ => str("seed")).getOrElse("rp")))
        case "vector_reproject" =>
          TableV(VectorOps.reprojectVector(table("data"), "geometry",
            str("source"), str("projection")))
        case "load_geojson" =>
          TableV(VectorOps.loadGeoJson(
            org.apache.spark.sql.SparkSession.active, str("data"),
            opt("properties").map(_ => strs("properties")).getOrElse(Nil)))
        case "load_result" =>
          // openEO core process: reload a previous save_result parquet
          // sink as a cube, metadata from the _graft_cube.json sidecar
          // (CubeIO.loadResult; ResultNotFound on a missing store/sidecar)
          CubeV(graft.sources.CubeIO.loadResult(
            org.apache.spark.sql.SparkSession.active, str("id")))
        case "load_uploaded_files" =>
          // openEO core process (beyond the reference's exports): read a
          // user's uploaded file LIST in one format and union them — each
          // path goes through the same per-format loader as load_url, so
          // parquet stays a lazy distributed scan
          val paths = strs("paths")
          require(paths.nonEmpty, "load_uploaded_files: empty `paths`")
          val fmt = str("format")
          val dfs = paths.map { p =>
            val uri =
              if (p.contains("://")) p
              else java.nio.file.Paths.get(p).toUri.toString
            graft.sources.UrlLoader.loadUrl(
              org.apache.spark.sql.SparkSession.active, uri, fmt)
          }
          TableV(dfs.reduce(_ unionByName _))
        case "load_vector_cube" =>
          TableV(VectorOps.loadVectorCube(
            org.apache.spark.sql.SparkSession.active,
            url = opt("URL").orElse(opt("url")).map(_.asInstanceOf[StrV].v),
            filename = opt("filename").map(_.asInstanceOf[StrV].v),
            geometries = opt("geometries").map(_.asInstanceOf[StrV].v),
            properties = opt("properties").map(_ => strs("properties"))
              .getOrElse(Nil)))

        // ---- load_stac (reference: cubes/load.py:94-322) ----
        case "load_stac" =>
          val assets = graft.sources.StacLoader.loadCatalogItems(str("url"))
          val timeRange = opt("temporal_extent").map { _ =>
            val ext = args("temporal_extent").asInstanceOf[ArrV].v
            val (s, e) = (nullableStr(ext(0), "temporal_extent"),
              nullableStr(ext(1), "temporal_extent"))
            require(s.nonEmpty || e.nonEmpty,
              "TemporalExtentEmpty: both temporal bounds are null")
            // "" = open bound in filterAssets' lexicographic interval
            (s.getOrElse(""), e.getOrElse(""))
          }
          // properties: either the flattened {"name": [[op, value], ...]}
          // form, or the openEO WIRE form — one comparison callback
          // sub-graph per property ({"name": {"process_graph": {... eq/lt
          // over {"from_parameter": "value"} ...}}}), which is what real
          // exported graphs carry (reference forwards it as the STAC query
          // extension, cubes/load.py:153-154)
          def litText(j: JValue): String = j match {
            case JString(s) => s
            case JInt(i) => i.toString
            case JDouble(d) => d.toString
            case JDecimal(d) => d.toString
            case JBool(b) => b.toString
            case other => JsonMethods.compact(JsonMethods.render(other))
          }
          def callbackCond(k: String, pg: JValue): (String, String) = {
            val nodesJ = pg match {
              case JObject(fs) => fs
              case v => throw new IllegalArgumentException(
                s"load_stac.properties.$k: bad callback $v")
            }
            val body = nodesJ.collectFirst {
              case (_, b) if (b \ "result") == JBool(true) => b
            }.getOrElse(nodesJ.head._2)
            val pid = (body \ "process_id") match {
              case JString(s) => s
              case v => throw new IllegalArgumentException(
                s"load_stac.properties.$k: no process_id ($v)")
            }
            require(Set("eq", "neq", "lt", "lte", "gt", "gte")(pid),
              s"ProcessUnsupported: load_stac.properties.$k callback $pid " +
                "(eq/neq/lt/lte/gt/gte only)")
            def isParam(j: JValue) = (j \ "from_parameter") != JNothing
            val x = body \ "arguments" \ "x"
            val y = body \ "arguments" \ "y"
            if (isParam(x)) (pid, litText(y))
            else if (isParam(y)) {
              // the property value sits on y: flip the comparison
              val flipped = pid match {
                case "lt" => "gt"; case "gt" => "lt"
                case "lte" => "gte"; case "gte" => "lte"; case o => o
              }
              (flipped, litText(x))
            } else throw new IllegalArgumentException(
              s"load_stac.properties.$k: neither side is from_parameter")
          }
          val props: Map[String, Seq[(String, String)]] =
            opt("properties").map { _ =>
              JsonMethods.parse(str("properties")) match {
                case JObject(fields) => fields.map { case (k, v) =>
                  k -> (v match {
                    case JArray(conds) => conds.map {
                      case JArray(Seq(JString(op), JString(value))) => (op, value)
                      case JArray(Seq(JString(op), other)) =>
                        (op, litText(other))
                      case c => throw new IllegalArgumentException(
                        s"load_stac.properties.$k: bad condition $c")
                    }
                    case obj: JObject if (obj \ "process_graph") != JNothing =>
                      Seq(callbackCond(k, obj \ "process_graph"))
                    case c => throw new IllegalArgumentException(
                      s"load_stac.properties.$k: expected [[op, value]] or " +
                        s"a comparison callback, got $c")
                  })
                }.toMap
                case v => throw new IllegalArgumentException(
                  s"load_stac.properties: $v")
              }
            }.getOrElse(Map.empty)
          // spatial_extent prunes twice: item-level (assets whose bbox
          // misses the extent never plan any pixel work) and store-level
          // (the extent maps to chunk/segment index ranges inside
          // ZarrReader/TiffReader — a small bbox over a huge store decodes
          // only intersecting chunks, reference cubes/load.py:245-310)
          val bboxOpt = opt("spatial_extent").map { _ =>
            val e = JsonMethods.parse(str("spatial_extent"))
            def d(f: String): Option[Double] = (e \ f) match {
              case JDouble(x) => Some(x)
              case JInt(x) => Some(x.toDouble)
              case JDecimal(x) => Some(x.toDouble)
              case _ => None
            }
            (d("west"), d("east"), d("south"), d("north")) match {
              case (Some(w), Some(ea), Some(so), Some(no)) => (w, so, ea, no)
              case _ => throw new IllegalArgumentException(
                "load_stac.spatial_extent: need west/east/south/north")
            }
          }
          val sel = graft.sources.StacLoader.filterAssets(assets,
            bands = opt("bands").map(_ => strs("bands")),
            bbox = bboxOpt,
            timeRange = timeRange, properties = props)
          // temporal_extent prunes twice as well: item-level above and
          // store-level here — on a time-axis zarr store (cube:dimensions
          // labels) the extent maps to axis-0 chunk-index ranges, the
          // temporal twin of the bbox → chunk pushdown
          CubeV(graft.sources.StacLoader.loadCube(
            org.apache.spark.sql.SparkSession.active, sel, bbox = bboxOpt,
            timeRange = timeRange))

        // ---- scalar ----
        case "add" => ColV(Scalar.add(column("x"), column("y")))
        case "subtract" => ColV(Scalar.subtract(column("x"), column("y")))
        case "multiply" => ColV(Scalar.multiply(column("x"), column("y")))
        case "divide" => ColV(Scalar.divide(column("x"), column("y")))
        case "power" => ColV(Scalar.power(column("base"), column("p")))
        case "sqrt" => ColV(Scalar.sqrtC(column("x")))
        case "ln" => ColV(Scalar.ln(column("x")))
        case "exp" => ColV(Scalar.expC(column("x")))
        case "absolute" => ColV(Scalar.absolute(column("x")))
        case "floor" => ColV(Scalar.floorC(column("x")))
        case "clip" =>
          ColV(Scalar.clip(column("x"), num("min"), num("max")))
        case "linear_scale_range" =>
          ColV(Scalar.linearScaleRange(column("x"),
            num("inputMin"), num("inputMax"),
            args.get("outputMin").collect { case NumV(v) => v }.getOrElse(0.0),
            args.get("outputMax").collect { case NumV(v) => v }.getOrElse(1.0)))
        case "e" => ColV(Scalar.e)
        case "pi" => ColV(Scalar.pi)
        case "nan" => ColV(Scalar.nan)
        case "constant" => ColV(column("x"))
        case "mod" => ColV(Scalar.mod(column("x"), column("y")))
        case "arctan2" => ColV(Scalar.arctan2(column("y"), column("x")))
        case "log" => ColV(Scalar.logBase(column("x"), column("base")))
        case "normalized_difference" =>
          ColV(Scalar.normalizedDifference(column("x"), column("y")))
        case "ceil" => ColV(Scalar.ceilC(column("x")))
        case "int" => ColV(Scalar.int(column("x")))
        case "round" => ColV(Scalar.roundHalfEven(column("x"),
          args.get("p").collect { case NumV(v) => v.toInt }.getOrElse(0)))
        case "sgn" => ColV(Scalar.sgn(column("x")))
        // trigonometry family (reference: math.py:240-285)
        case "sin" => ColV(Scalar.sinC(column("x")))
        case "cos" => ColV(Scalar.cosC(column("x")))
        case "tan" => ColV(Scalar.tanC(column("x")))
        case "arcsin" => ColV(Scalar.arcsin(column("x")))
        case "arccos" => ColV(Scalar.arccos(column("x")))
        case "arctan" => ColV(Scalar.arctan(column("x")))
        case "sinh" => ColV(Scalar.sinhC(column("x")))
        case "cosh" => ColV(Scalar.coshC(column("x")))
        case "tanh" => ColV(Scalar.tanhC(column("x")))
        case "arsinh" => ColV(Scalar.arsinh(column("x")))
        case "arcosh" => ColV(Scalar.arcosh(column("x")))
        case "artanh" => ColV(Scalar.artanh(column("x")))
        case "is_nodata" => ColV(Scalar.isNodata(column("x")))
        case "is_valid" => ColV(Scalar.isValid(column("x")))
        case "is_nan" => ColV(Scalar.isNanC(column("x")))
        case "is_infinite" => ColV(Scalar.isInfinite(column("x")))
        case "gt" => ColV(Scalar.gt(column("x"), column("y")))
        case "lt" => ColV(Scalar.lt(column("x"), column("y")))
        case "gte" => ColV(Scalar.gte(column("x"), column("y")))
        case "lte" => ColV(Scalar.lte(column("x"), column("y")))
        case "eq" =>
          ColV(Scalar.eq(column("x"), column("y"),
            delta = args.get("delta").collect { case NumV(d) => d },
            caseSensitive =
              !args.get("case_sensitive").contains(BoolV(false))))
        case "between" =>
          ColV(Scalar.between(column("x"), column("min"), column("max"),
            excludeMax = args.get("exclude_max").contains(BoolV(true))))
        // text sub-language (reference: text.py)
        case "text_begins" =>
          ColV(Scalar.textBegins(column("data"), str("pattern"),
            !args.get("case_sensitive").contains(BoolV(false))))
        case "text_ends" =>
          ColV(Scalar.textEnds(column("data"), str("pattern"),
            !args.get("case_sensitive").contains(BoolV(false))))
        case "text_contains" =>
          ColV(Scalar.textContains(column("data"), str("pattern"),
            !args.get("case_sensitive").contains(BoolV(false))))
        case "text_concat" =>
          val items = args("data").asInstanceOf[ArrV].v.map {
            case ColV(c) => c
            case NumV(v) => lit(v)
            case StrV(s) => lit(s)
            case BoolV(b) => lit(b)
            case NullV => lit(null)
            case v => throw new IllegalArgumentException(s"text_concat item $v")
          }
          ColV(Scalar.textConcat(items,
            opt("separator").map(_.asInstanceOf[StrV].v).getOrElse("")))
        // crawl/text-pipeline sub-language (beyond the reference: the
        // LLM-data operators graded first-class — scalar forms usable in
        // any apply/apply_dimension callback over a text-valued cube)
        case "html_extract" =>
          ColV(graft.pipeline.TextAnalysis.htmlExtract(column("x")))
        case "canonicalize_url" =>
          ColV(graft.pipeline.TextAnalysis.canonicalizeUrl(column("x")))
        case "registered_domain" =>
          // full-PSL eTLD+1 of a URL or host (url_host composes when the
          // input is a URL)
          ColV(graft.pipeline.TextAnalysis.registeredDomain(column("x")))
        case "url_host" =>
          ColV(graft.pipeline.TextAnalysis.urlHost(column("x")))
        case "lang_id" =>
          ColV(graft.pipeline.TextAnalysis.langId(column("x")))
        case "token_count" =>
          ColV(graft.pipeline.TextAnalysis.tokenCount(column("x")))
        case "subword_count" =>
          ColV(graft.pipeline.TextAnalysis.subwordCount(column("x")))
        case "quality_score" =>
          ColV(graft.pipeline.TextAnalysis.qualityScore(column("x")))
        case "fingerprint" =>
          ColV(graft.pipeline.TextAnalysis.fingerprint(column("x")))
        case "content_hash" =>
          ColV(graft.pipeline.TextAnalysis.contentHash(column("x")))
        case "redact_pii" =>
          // scalar form of the cube-level pii_redact, composable inside
          // any apply callback
          ColV(graft.pipeline.TextAnalysis.redactPii(column("x")))
        // dates (reference: dates.py)
        case "date_between" =>
          ColV(Scalar.dateBetween(column("x"), column("min"), column("max")))
        case "date_difference" =>
          ColV(Scalar.dateDifference(column("date1"), column("date2"),
            opt("unit").map(_.asInstanceOf[StrV].v).getOrElse("second")))
        case "date_shift" =>
          ColV(Scalar.dateShift(column("date"), num("value").toInt, str("unit")))
        // array sub-language over ArrayType columns (reference: arrays.py)
        case "array_element" =>
          // index, or a `label` resolved against the reduced dimension's
          // label list (injected by the ordered-array reduce as `_labels`;
          // published NDVI graphs address bands by label)
          if (args.contains("index") && args.contains("label"))
            throw new IllegalArgumentException(
              "ArrayElementParameterConflict: the process `array_element` " +
                "only allows that either the `index` or the `label` " +
                "parameter is set") // reference arrays.py:79-83
          args("data") match {
            // LABELED array (a labels→values map): label access is a
            // guarded map lookup — a missing label raises the reference's
            // ArrayElementNotAvailable unless return_nodata; index access
            // goes positionally through the entry values (arrays.py:85-121)
            case LabeledV(m) =>
              val rn = args.get("return_nodata").contains(BoolV(true))
              args.get("label") match {
                case Some(StrV(lab)) => ColV(
                  graft.functions.ArrayFns.labeledElement(m, lit(lab), rn))
                case Some(NumV(lab)) => ColV(
                  graft.functions.ArrayFns.labeledElement(m, lit(lab), rn))
                case _ => ColV(graft.functions.ArrayFns.arrayElement(
                  map_values(m), num("index").toInt))
              }
            case _ =>
              val idx = args.get("index") match {
                case Some(NumV(v)) => v.toInt
                case _ => (args.get("label"), ctx.get("_labels")) match {
                  case (Some(StrV(lab)), Some(ArrV(ls))) =>
                    val i = ls.indexWhere {
                      case StrV(s) => s == lab
                      case _ => false
                    }
                    require(i >= 0, s"ArrayElementNotAvailable: label '$lab' " +
                      s"not among ${ls.size} dimension labels")
                    i
                  case (Some(StrV(_)), _) => throw new IllegalArgumentException(
                    "ArrayNotLabeled: array_element label access needs a " +
                      "labeled array context")
                  case _ => throw new IllegalArgumentException(
                    "ArrayElementParameterMissing: the process `array_element` " +
                      "requires either the `index` or `label` parameter to be " +
                      "set") // reference arrays.py:74-78
                }
              }
              ColV(graft.functions.ArrayFns.arrayElement(column("data"), idx))
          }
        case "array_concat" => (args("array1"), args("array2")) match {
          // both labeled: shared labels are the reference's
          // ArrayLabelConflict (arrays.py:189-199)
          case (LabeledV(a), LabeledV(b)) =>
            LabeledV(graft.functions.ArrayFns.labeledConcat(a, b))
          case _ => ColV(concat(column("array1"), column("array2")))
        }
        case "array_append" =>
          ColV(graft.functions.ArrayFns.arrayAppend(column("data"), column("value")))
        case "array_contains" =>
          ColV(graft.functions.ArrayFns.arrayContains(column("data"), column("value")))
        case "array_apply" =>
          ColV(graft.functions.ArrayFns.arrayApply(column("data"),
            x => runCallback(str("process"),
              Map("x" -> ColV(x), "data" -> ColV(x)) ++ callbackContext) match {
              case ColV(out) => out
              case NumV(v) => lit(v)
              case v => throw new IllegalArgumentException(s"array_apply cb $v")
            }))
        case "array_filter" =>
          ColV(graft.functions.ArrayFns.arrayFilter(column("data"),
            x => (runCallback(str("condition"),
              Map("x" -> ColV(x), "data" -> ColV(x)) ++ callbackContext) match {
              case ColV(out) => out
              case v => throw new IllegalArgumentException(s"array_filter cb $v")
            }).cast("boolean")))
        case "array_create" =>
          ColV(graft.functions.ArrayFns.arrayCreate(column("data"),
            args.get("repeat").collect { case NumV(n) => n.toInt }.getOrElse(1)))
        case "array_modify" =>
          val mLen =
            args.get("length").collect { case NumV(n) => n.toInt }.getOrElse(1)
          (args("data"), args.get("values")) match {
            case (LabeledV(d), Some(LabeledV(v))) =>
              LabeledV(graft.functions.ArrayFns.labeledModify(
                d, v, num("index").toInt, mLen))
            case _ => ColV(graft.functions.ArrayFns.arrayModify(
              column("data"), column("values"), num("index").toInt, mLen))
          }
        case "array_find" =>
          ColV(graft.functions.ArrayFns.arrayFind(column("data"),
            column("value"),
            reverse = args.get("reverse").contains(BoolV(true))))
        case "array_labels" =>
          ColV(graft.functions.ArrayFns.arrayLabels(column("data")))
        case "sort" =>
          ColV(graft.functions.ArrayFns.arraySort(column("data"),
            ascending = !args.get("asc").contains(BoolV(false))))
        case "order" =>
          ColV(graft.functions.ArrayFns.orderIndices(column("data"),
            ascending = !args.get("asc").contains(BoolV(false))))
        case "rearrange" =>
          ColV(graft.functions.ArrayFns.rearrange(column("data"),
            column("order")))
        // first/last are position-dependent: in an ordered-reduce context
        // (reduce_dimension injects `_order` = the reduced dim) they become
        // min_by/max_by aggregates over dimension order; in array context
        // they index the array (reference: arrays.py:461-495 for both)
        case "first" => ctx.get("_order") match {
          case Some(ColV(ord)) => ColV(Reducers.firstByOrder(column("data"), ord,
            ignoreNodata = !args.get("ignore_nodata").contains(BoolV(false))))
          case _ => ColV(graft.functions.ArrayFns.arrayFirst(column("data"),
            ignoreNodata = !args.get("ignore_nodata").contains(BoolV(false))))
        }
        case "last" => ctx.get("_order") match {
          case Some(ColV(ord)) => ColV(Reducers.lastByOrder(column("data"), ord,
            ignoreNodata = !args.get("ignore_nodata").contains(BoolV(false))))
          case _ => ColV(graft.functions.ArrayFns.arrayLast(column("data"),
            ignoreNodata = !args.get("ignore_nodata").contains(BoolV(false))))
        }
        case "neq" => ColV(Scalar.neq(column("x"), column("y")))
        case "and" => ColV(Scalar.and(column("x"), column("y")))
        case "or" => ColV(Scalar.or(column("x"), column("y")))
        case "xor" => ColV(Scalar.xor(column("x"), column("y")))
        case "not" => ColV(Scalar.not(column("x")))
        case "if" => ColV(Scalar.ifThen(column("value"), column("accept"),
          args.get("reject").map(_ => column("reject")).getOrElse(lit(null))))

        // ---- reducers (inside reduce_dimension callbacks) ----
        // Dual-context like first/last: in an `_array` reduce (the
        // ordered-array path — and any argument that is itself a literal
        // array, e.g. the published EVI example's sum over
        // [1, nir, 6*red, -7.5*blue]) they fold the array scalar-wise;
        // otherwise they are the partial-agg aggregates.
        case "mean" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayMean(column("data"))
          else Reducers.meanR(column("data")))
        case "sum" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arraySum(column("data"))
          else Reducers.sumR(column("data")))
        case "min" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayMin(column("data"))
          else Reducers.minR(column("data")))
        case "max" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayMax(column("data"))
          else Reducers.maxR(column("data")))
        case "median" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayMedian(column("data"))
          else Reducers.medianR(column("data")))
        case "sd" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arraySd(column("data"))
          else Reducers.sdR(column("data")))
        case "variance" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayVariance(column("data"))
          else Reducers.varianceR(column("data")))
        case "count" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayCountValid(column("data"))
          else Reducers.countValid(column("data")))
        case "product" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayProduct(column("data"))
          else Reducers.productR(column("data")))
        case "extrema" =>
          ColV(if (ctx.contains("_array")) ArrayFns.arrayExtrema(column("data"))
          else Reducers.extremaR(column("data")))
        case "any" =>
          val ig = !args.get("ignore_nodata").contains(BoolV(false))
          ColV(if (ctx.contains("_array")) ArrayFns.arrayAnyTrue(column("data"), ig)
          else Reducers.anyR(column("data"), ig))
        case "all" =>
          val ig = !args.get("ignore_nodata").contains(BoolV(false))
          ColV(if (ctx.contains("_array")) ArrayFns.arrayAllTrue(column("data"), ig)
          else Reducers.allR(column("data"), ig))
        case "quantiles" =>
          // probabilities XOR q, with q (or a bare int) expanding to the
          // q-1 equidistant cut points (reference: math.py:341-365 —
          // QuantilesParameterConflict / QuantilesParameterMissing)
          def equidistant(q: Int): Seq[Double] =
            (1 until q).map(i => i.toDouble / q)
          val ps = (args.get("probabilities"), args.get("q")) match {
            case (Some(_), Some(_)) => throw new IllegalArgumentException(
              "QuantilesParameterConflict: set either `probabilities` or" +
                " `q`, not both")
            case (None, None) => throw new IllegalArgumentException(
              "QuantilesParameterMissing: one of `probabilities` or `q`" +
                " is required")
            case (Some(NumV(n)), _) => equidistant(n.toInt)
            // a ONE-element integral list is the q-count form too
            // (reference: math.py:356-362 expands [4] to quartile cuts).
            // JSON numbers arrive as doubles here, so "integral" means
            // whole-valued AND >= 2 — 0.0/1.0 stay literal probabilities
            // (both are valid), and any whole number >= 2 cannot be one.
            case (Some(ArrV(Seq(NumV(n)))), _)
                if n == math.floor(n) && n >= 2 =>
              equidistant(n.toInt)
            case (Some(ArrV(vs)), _) =>
              vs.map { case NumV(v) => v
                case v => throw new IllegalArgumentException(
                  s"quantiles: non-numeric probability $v") }
            case (_, Some(NumV(n))) => equidistant(n.toInt)
            case (p, q) => throw new IllegalArgumentException(
              s"quantiles: invalid parameters $p / $q")
          }
          ColV(if (ctx.contains("_array"))
            ArrayFns.arrayQuantiles(column("data"), ps)
          else Reducers.quantilesR(column("data"), ps))

        case other =>
          throw new IllegalArgumentException(s"ProcessUnsupported: $other")
      }
    }
  }
}
