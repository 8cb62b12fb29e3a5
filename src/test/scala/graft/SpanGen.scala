package graft

import graft.model.{Annotation, Endpoint, Span}
import org.scalacheck.Gen

/** Shared canonical-span generator for generative round-trip specs (proto3
  * codec, SC6 JSON encode). Spans cover every schema field, including the
  * ones the driver's event fixture never populates (annotations, ipv6, port,
  * shared/debug).
  */
object SpanGen {
  val genHex16: Gen[String] =
    Gen.listOfN(16, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
  val genHex32: Gen[String] =
    Gen.listOfN(32, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
  val genStr: Gen[String] = Gen.oneOf(Gen.alphaNumStr.map(_.take(12)),
    Gen.const("héllo wörld"), Gen.const("日本語"), Gen.const(""))
  val genIp4: Gen[String] = Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))
  val genIp6: Gen[String] = Gen.listOfN(16, Gen.choose(0, 255)).map { bytes =>
    // generator emits the JVM's canonical text form so decode == input
    java.net.InetAddress.getByAddress(bytes.map(_.toByte).toArray).getHostAddress
  }
  val genEndpoint: Gen[Endpoint] = for {
    svc <- Gen.option(genStr)
    ip4 <- Gen.option(genIp4)
    ip6 <- Gen.option(genIp6)
    port <- Gen.option(Gen.choose(0, 65535))
  } yield Endpoint(svc, ip4, ip6, port)
  val genSpan: Gen[Span] = for {
    tid <- Gen.oneOf(genHex16, genHex32)
    pid <- Gen.option(genHex16)
    id <- genHex16
    kind <- Gen.option(Gen.oneOf("CLIENT", "SERVER", "PRODUCER", "CONSUMER"))
    name <- Gen.option(genStr)
    ts <- Gen.option(Gen.choose(0L, Long.MaxValue))
    dur <- Gen.option(Gen.choose(0L, Long.MaxValue))
    lep <- Gen.option(genEndpoint)
    rep <- Gen.option(genEndpoint)
    anns <- Gen.listOfN(2, Gen.zip(Gen.choose(0L, 1L << 60), genStr))
      .map(_.map { case (t, v) => Annotation(t, v) })
    tags <- Gen.mapOfN(3, Gen.zip(genStr.suchThat(_.nonEmpty), genStr))
    // proto3 can't carry an explicit false — only true/absent round-trips
    shared <- Gen.option(Gen.const(true))
    debug <- Gen.option(Gen.const(true))
  } yield Span(tid, pid, id, kind, name, ts, dur, lep, rep, anns, tags, shared, debug)

  /** Deterministic list of 0-4 spans for a numeric seed. */
  def spanList(seed: Int): Seq[Span] =
    Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, genSpan))
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong)).get
}
