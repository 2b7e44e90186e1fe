package graft.sources

import graft.sources.Bson._

/** Replica-set awareness for the wire connector — the CLIENT half of
  * the public server-discovery ("SDAM") and server-selection specs,
  * reduced to what a bulk-analytics reader needs (the reference's
  * pymongo client gets this from its driver; here it is part of the
  * connector):
  *
  *  - **Discovery**: `hello` any reachable seed; the reply's
  *    `setName` / `hosts` / `primary` / `secondary` fields describe
  *    the set, and each member's own hello is authoritative about its
  *    role. One hello per member, driver-side, per plan — this is the
  *    monitor-less (on-demand) variant of SDAM: a 100 TB scan plans
  *    once and then holds per-partition cursors, so a standing
  *    heartbeat thread buys nothing here.
  *  - **Selection**: the five public read-preference modes. Reads
  *    with a non-`primary` mode carry `$readPreference` in the
  *    command (OP_MSG has no secondaryOk flag — the field IS the
  *    signal, and a real secondary refuses reads without it:
  *    code 13435 NotPrimaryNoSecondaryOk). Writes always select the
  *    primary.
  *  - **Spreading**: eligible members are selected round-robin by
  *    partition index, so a ranged scan's cursors land across every
  *    eligible secondary instead of piling onto one — the reason
  *    `readpreference=secondary` exists at 100 TB is to take the
  *    scan OFF the primary and ACROSS the secondaries.
  *
  * Retryable READS are deliberately not implemented at the cursor
  * level: Spark's task retry already re-runs a failed partition from
  * the top, which is the correct unit here (a mid-cursor network
  * error invalidates the cursor anyway). Retryable WRITES handle
  * failover in [[MongoWire.RetryableWriter]]: a retryable server
  * error (NotWritablePrimary & co.) re-discovers and replays the
  * same (lsid, txnNumber) on the new primary exactly once.
  */
object Replica {

  /** The five public read-preference modes, canonical casing. */
  val Modes: Seq[String] = Seq("primary", "primaryPreferred",
    "secondary", "secondaryPreferred", "nearest")

  /** Case-insensitive parse to the canonical mode name — anything
    * else is a loud error, never a silent primary fallback.
    */
  def parseMode(s: String): String =
    Modes.find(_.equalsIgnoreCase(s)).getOrElse(
      throw new IllegalArgumentException(
        s"unknown readpreference '$s' (${Modes.mkString(", ")})"))

  /** The `$readPreference` global command argument for a mode — None
    * for `primary` (the default needs no field; a bare command IS a
    * primary read, and a secondary refuses it).
    */
  def readPrefArg(mode: String): Option[String] = {
    val m = parseMode(mode)
    if (m == "primary") None else Some(m)
  }

  /** The full `$readPreference` DOCUMENT a cursor command carries:
    * `{mode}` plus `tags: [...]` when tag sets are declared — the
    * shape a mongos needs to route across its shards' replica sets
    * (replica-set members read only the mode; tags select
    * client-side there). None for `primary`.
    */
  def readPrefDoc(mode: String,
                  tagSets: Seq[Map[String, String]]): Option[BDoc] =
    readPrefArg(mode).map { m =>
      val parts = Seq.newBuilder[(String, BVal)]
      parts += "mode" -> BString(m)
      if (tagSets.nonEmpty)
        parts += "tags" -> BArr(tagSets.map(ts =>
          BDoc(ts.toSeq.sortBy(_._1).map { case (k, v) =>
            k -> (BString(v): BVal)
          }): BVal))
      BDoc(parts.result())
    }

  /** One seed list: `"h1:p1,h2:p2"` (ports inline) or a single bare
    * host whose port arrives separately.
    */
  def parseSeeds(host: String, port: => Int): Seq[(String, Int)] =
    if (host.contains(':') || host.contains(','))
      host.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { hp =>
        val i = hp.lastIndexOf(':')
        require(i > 0 && i < hp.length - 1,
          s"seed '$hp' wants host:port")
        (hp.substring(0, i), hp.substring(i + 1).toInt)
      }
    else Seq((host, port))

  /** One member as its own hello describes it. */
  final case class Member(host: String, port: Int, primary: Boolean,
                          secondary: Boolean, rttNanos: Long,
                          tags: Map[String, String] = Map.empty,
                          mongos: Boolean = false) {
    def address: String = s"$host:$port"
    /** Public tag-set rule: a member matches a tag set when it has
      * EVERY pair in the set (the empty set matches any member).
      */
    def matchesTagSet(ts: Map[String, String]): Boolean =
      ts.forall { case (k, v) => tags.get(k).contains(v) }
  }

  /** Parses the `readpreferencetags` option: an ORDERED list of
    * tag-set alternatives, semicolon-separated, each set a
    * comma-separated `key:value` list; a trailing empty set
    * (`"...;"`) is the documented match-anything fallback. E.g.
    * `"nodeType:ANALYTICS,dc:east;nodeType:ANALYTICS;"` — prefer
    * east analytics nodes, then any analytics node, then anyone.
    */
  def parseTagSets(s: String): Seq[Map[String, String]] = {
    // split keeping trailing empties: ";" terminators are meaningful
    val sets = s.split(";", -1).toSeq.map(_.trim)
    // a trailing "" from "a;" is ONE empty fallback set, not zero
    val trimmed =
      if (sets.length > 1 && sets.last.isEmpty) sets.init :+ ""
      else sets
    trimmed.map { set =>
      if (set.isEmpty) Map.empty[String, String]
      else set.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map {
        pair =>
          val i = pair.indexOf(':')
          require(i > 0 && i < pair.length - 1,
            s"readpreferencetags pair '$pair' wants key:value")
          (pair.substring(0, i).trim, pair.substring(i + 1).trim)
      }.toMap
    }
  }

  final case class Topology(setName: Option[String],
                            members: Seq[Member]) {
    def primary: Option[Member] = members.find(_.primary)
    def secondaries: Seq[Member] = members.filter(_.secondary)
    /** A seed list of mongos ROUTERS (no set name, every member
      * `msg: "isdbgrid"`): selection returns every router for every
      * mode — the drivers-spec Mongos topology rule. The mode and
      * tags are not applied client-side; they FORWARD in
      * `$readPreference` and the router routes across its shards'
      * replica sets.
      */
    def isMongosFleet: Boolean =
      setName.isEmpty && members.nonEmpty && members.forall(_.mongos)
  }

  private def helloStr(d: BDoc, k: String): Option[String] =
    d.v.collectFirst { case (`k`, BString(s)) => s }
  private def helloBool(d: BDoc, k: String): Boolean =
    d.v.collectFirst { case (`k`, BBool(b)) => b }.getOrElse(false)

  private def splitAddr(a: String): (String, Int) = {
    val i = a.lastIndexOf(':')
    require(i > 0 && i < a.length - 1, s"member address '$a'")
    (a.substring(0, i), a.substring(i + 1).toInt)
  }

  /** Discovers the topology from a seed list: hello each seed until
    * one answers, union in the reply's `hosts` list, then hello every
    * member once (its own reply is authoritative about its role; the
    * hello round trip is also the RTT measurement `nearest` uses).
    * `hello` needs no authentication (the handshake precedes auth on
    * a real server too), so discovery works against auth-gated sets.
    *
    * A member whose `setName` disagrees with `expectSetName` (or with
    * the other members) is a loud error — connecting to the WRONG
    * replica set must never silently succeed.
    */
  def discover(seeds: Seq[(String, Int)],
               tls: Option[Tls.Conf] = None,
               expectSetName: Option[String] = None,
               helloTimeoutMs: Int = 10000): Topology = {
    require(seeds.nonEmpty, "discover wants at least one seed")
    val seen = scala.collection.mutable.LinkedHashMap
      .empty[String, Member]
    var setName: Option[String] = expectSetName
    val queue = scala.collection.mutable.Queue
      .empty[(String, Int)]
    queue ++= seeds
    val failures = Seq.newBuilder[String]
    while (queue.nonEmpty) {
      val (h, p) = queue.dequeue()
      val addr = s"$h:$p"
      if (!seen.contains(addr)) {
        val replyOpt =
          try {
            val t0 = System.nanoTime()
            // BOUNDED (connect + read): a blackholed seed costs one
            // timeout and lands in the failure list — it must never
            // hang the whole plan (the discovery twin of the r17
            // hung-server fix)
            val r = MongoWire.hello(h, p, tls = tls,
              timeoutMs = helloTimeoutMs)
            Some((r, System.nanoTime() - t0))
          } catch {
            case e: Exception =>
              failures += s"$addr: ${e.getMessage}"
              None
          }
        replyOpt.foreach { case (r, rtt) =>
          helloStr(r, "setName") match {
            case Some(sn) =>
              setName match {
                case Some(expected) => require(sn == expected,
                  s"member $addr belongs to replica set '$sn', " +
                    s"expected '$expected'")
                case None => setName = Some(sn)
              }
            case None => require(setName.isEmpty,
              s"member $addr is not a replica-set member " +
                s"(expected set '${setName.get}')")
          }
          seen(addr) = Member(h, p,
            primary = helloBool(r, "isWritablePrimary"),
            secondary = helloBool(r, "secondary"), rttNanos = rtt,
            tags = r.v.collectFirst { case ("tags", t: BDoc) =>
              t.v.collect { case (k, BString(v)) => (k, v) }.toMap
            }.getOrElse(Map.empty),
            mongos = helloStr(r, "msg").contains("isdbgrid"))
          r.v.collectFirst { case ("hosts", BArr(hs)) =>
            hs.collect { case BString(a) => a }
          }.getOrElse(Seq.empty).foreach { a =>
            if (!seen.contains(a)) queue += splitAddr(a)
          }
        }
      }
    }
    require(seen.nonEmpty,
      s"no replica-set member reachable: ${failures.result()
        .mkString("; ")}")
    Topology(setName, seen.values.toSeq)
  }

  /** Applies the ordered tag-set alternatives: the FIRST set that
    * matches at least one member wins, and only members matching
    * that set survive (the public server-selection rule). No sets
    * declared = no filtering.
    */
  private def tagFilter(ms: Seq[Member],
                        tagSets: Seq[Map[String, String]])
      : Seq[Member] =
    if (tagSets.isEmpty) ms
    else tagSets.iterator.map(ts => ms.filter(_.matchesTagSet(ts)))
      .find(_.nonEmpty).getOrElse(Seq.empty)

  /** JVM-wide topology cache — the connector's stand-in for the
    * drivers' shared SDAM state. Without it every writer
    * (re)connection and every scan plan re-hellos the whole set: a
    * 10k-partition write would spend 10k × members discovery round
    * trips, and a step-down would stampede every in-flight writer
    * into simultaneous re-discovery. A short TTL bounds staleness
    * (a stale primary pointer costs exactly one 10107-retry, which
    * [[invalidate]] turns into a fresh discovery), and the key
    * carries the full (seeds, set name, TLS) identity so two
    * deployments never share an entry.
    */
  private val topoCache = new java.util.concurrent.ConcurrentHashMap[
    (Seq[(String, Int)], Option[String], Option[Tls.Conf]),
    (Long, Topology)]()
  private val TopoTtlMs = 10000L

  /** [[discover]] through the JVM-wide cache (TTL 10 s). Use on hot
    * per-partition paths (writer connections); plan-time driver code
    * may use either.
    */
  def discoverCached(seeds: Seq[(String, Int)],
                     tls: Option[Tls.Conf] = None,
                     expectSetName: Option[String] = None,
                     helloTimeoutMs: Int = 10000): Topology = {
    val key = (seeds.sortBy(s => (s._1, s._2)), expectSetName, tls)
    val now = System.currentTimeMillis()
    topoCache.get(key) match {
      case (t0, topo) if now - t0 < TopoTtlMs => topo
      case _ =>
        val topo = discover(seeds, tls, expectSetName, helloTimeoutMs)
        topoCache.put(key, (now, topo))
        topo
    }
  }

  /** Drops every cached view of `seeds` — called when a server
    * answered "not me, re-select" (a RetryableWriteError), so the
    * very next discovery sees the post-election topology.
    */
  def invalidate(seeds: Seq[(String, Int)]): Unit = {
    val sorted = seeds.sortBy(s => (s._1, s._2))
    topoCache.keySet.removeIf(_._1 == sorted)
  }

  /** The members a mode may read from, in selection-priority order —
    * empty result is the CALLER's loud error (it knows the mode).
    * Tag sets follow the public scoping: ignored under `primary`;
    * under `primaryPreferred`/`secondaryPreferred` they filter only
    * the SECONDARY stage (the primary, when selected, is selected
    * regardless of its tags); under `secondary`/`nearest` they
    * filter every candidate.
    */
  private def eligible(topo: Topology, mode: String,
                       tagSets: Seq[Map[String, String]])
      : Seq[Member] =
    // mongos fleet: EVERY router serves EVERY mode (round-robin
    // balances across routers); mode + tags forward on the wire
    // instead of selecting client-side
    if (topo.isMongosFleet) { parseMode(mode); topo.members }
    else parseMode(mode) match {
      case "primary" => topo.primary.toSeq
      case "primaryPreferred" =>
        if (topo.primary.isDefined) topo.primary.toSeq
        else tagFilter(topo.secondaries, tagSets)
      case "secondary" => tagFilter(topo.secondaries, tagSets)
      case "secondaryPreferred" =>
        val secs = tagFilter(topo.secondaries, tagSets)
        if (secs.nonEmpty) secs else topo.primary.toSeq
      case "nearest" =>
        // tag-filter FIRST, then the public local-threshold rule:
        // members within 15 ms of the fastest survivor are all
        // "nearest" (then spread across them)
        val ok = tagFilter(topo.members, tagSets)
        if (ok.isEmpty) Seq.empty
        else {
          val best = ok.map(_.rttNanos).min
          ok.filter(_.rttNanos <= best + 15L * 1000 * 1000)
        }
      case _ => throw new IllegalStateException(mode)
    }

  /** Selects the member partition `idx` reads from: round-robin over
    * the eligible members in stable (address-sorted) order, so a
    * multi-partition scan SPREADS across every eligible member
    * deterministically.
    */
  def selectForRead(topo: Topology, mode: String, idx: Int,
                    tagSets: Seq[Map[String, String]] = Nil)
      : Member = {
    val es = eligible(topo, mode, tagSets).sortBy(_.address)
    require(es.nonEmpty,
      s"no replica-set member matches readpreference=$mode" +
        (if (tagSets.isEmpty) ""
         else s" tags ${tagSets.map(_.map { case (k, v) => s"$k:$v" }
           .mkString(",")).mkString("[", "; ", "]")}") +
        s" (primary: ${topo.primary.map(_.address).getOrElse("none")}, " +
        s"secondaries: ${topo.secondaries.map(_.address)
          .mkString(",")})")
    es(math.floorMod(idx, es.size))
  }

  /** The write target: the primary, or a loud error (a set without a
    * primary accepts no writes — callers retry AFTER re-discovery,
    * not by guessing).
    */
  def selectPrimary(topo: Topology): Member =
    topo.primary.getOrElse(throw new IllegalArgumentException(
      s"replica set${topo.setName.fold("")(n => s" '$n'")} has no " +
        "primary (members: " +
        s"${topo.members.map(_.address).mkString(",")})"))
}
