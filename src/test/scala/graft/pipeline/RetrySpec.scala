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
