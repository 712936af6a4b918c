package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {
  implicit val noSleep: Long => Unit = _ => ()

  test("succeeds immediately without retries") {
    var calls = 0
    val r = Retry(Retry.Policy(attempts = 3)) { () => calls += 1; "ok" }
    assert(r === "ok" && calls === 1)
  }

  test("retries until success") {
    var calls = 0
    val r = Retry(Retry.Policy(attempts = 5)) { () =>
      calls += 1
      if (calls < 3) sys.error("boom")
      calls
    }
    assert(r === 3)
  }

  test("exhausts attempts and rethrows the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry(Retry.Policy(attempts = 4)) { () => calls += 1; sys.error(s"fail $calls") }
    }
    assert(calls === 4 && e.getMessage === "fail 4")
  }

  test("retryOn=false aborts the loop immediately") {
    var calls = 0
    val fatal = new IllegalStateException("fatal")
    val e = intercept[IllegalStateException] {
      Retry(Retry.Policy(attempts = 5,
        retryOn = !_.isInstanceOf[IllegalStateException])) { () =>
        calls += 1; throw fatal
      }
    }
    assert(calls === 1 && (e eq fatal))
  }

  test("rotatingFetcher: proxy failure rotates without burning retry budget") {
    case class ProxyDown(p: String) extends RuntimeException(s"proxy $p down")
    val supplied = scala.collection.mutable.ArrayBuffer.empty[String]
    var n = 0
    val proxies = Retry.ProxyPolicy[String](
      acquire = () => { n += 1; val p = s"proxy$n"; supplied += p; p },
      needsRotation = _.isInstanceOf[ProxyDown])
    var attempts = 0
    val f = Retry.rotatingFetcher(proxies, Retry.Policy(attempts = 3)) {
      (p: String, url: String) =>
        attempts += 1
        if (p != "proxy3") throw ProxyDown(p) // first two endpoints are dead
        s"$p:$url"
    }
    assert(f("x") === "proxy3:x")
    // two rotations, each after ONE attempt (no inner retries burned)
    assert(supplied.toSeq === Seq("proxy1", "proxy2", "proxy3"))
    assert(attempts === 3)
    // the healthy endpoint is retained across calls
    assert(f("y") === "proxy3:y" && supplied.length === 3)
  }

  test("rotatingFetcher: non-proxy failures retry on the SAME endpoint") {
    var n = 0
    val proxies = Retry.ProxyPolicy[String](
      acquire = () => { n += 1; s"p$n" },
      needsRotation = _ => false)
    var calls = 0
    val f = Retry.rotatingFetcher(proxies, Retry.Policy(attempts = 4)) {
      (p: String, x: Int) =>
        calls += 1
        if (calls < 3) sys.error("transient")
        (p, x)
    }
    assert(f(1) === (("p1", 1)) && calls === 3 && n === 1)
  }

  test("rotatingFetcher: rotation cap rethrows the underlying failure") {
    case class ProxyDown(p: String) extends RuntimeException(p)
    var n = 0
    val proxies = Retry.ProxyPolicy[String](
      acquire = () => { n += 1; s"p$n" },
      needsRotation = _.isInstanceOf[ProxyDown], maxRotations = 2)
    val f = Retry.rotatingFetcher(proxies, Retry.Policy(attempts = 5)) {
      (p: String, _: Int) => throw ProxyDown(p)
    }
    val e = intercept[ProxyDown](f(1))
    assert(e.p === "p3" && n === 3) // initial + 2 rotations, then give up
  }

  test("fetcher wrapper applies the policy per call") {
    var calls = 0
    val f = Retry.fetcher(Retry.Policy(attempts = 2)) { (x: Int) =>
      calls += 1
      if (calls % 2 == 1) sys.error("flaky")
      x * 10
    }
    assert(f(4) === 40)
    assert(f(5) === 50)
  }
}
