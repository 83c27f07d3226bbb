package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TextKernelsSpec extends AnyFunSuite {

  test("tokenize handles empties, padding, multi-space") {
    assert(TextKernels.tokenize("").isEmpty)
    assert(TextKernels.tokenize("  ").isEmpty)
    assert(TextKernels.tokenize(" a  b\tc ").toSeq === Seq("a", "b", "c"))
  }

  test("shingleHashes: count and determinism") {
    assert(TextKernels.shingleHashes("a b c d", 3).length === 2)
    assert(TextKernels.shingleHashes("a b", 3).length === 1) // short doc
    assert(TextKernels.shingleHashes("x y z w", 2).toSeq ===
      TextKernels.shingleHashes("x y z w", 2).toSeq)
    // shingles are position-independent values: same windows, same hashes
    val h1 = TextKernels.shingleHashes("a b c", 3)(0)
    val h2 = TextKernels.shingleHashes("z a b c", 3)(1)
    assert(h1 === h2)
  }

  test("shingleJaccard: identity, disjoint, known overlap") {
    assert(TextKernels.shingleJaccard("a b c d e", "a b c d e", 3) === 1.0)
    assert(TextKernels.shingleJaccard("a b c", "x y z", 3) === 0.0)
    // "a b c d" vs "a b c e": shingles {abc,bcd} vs {abc,bce} -> 1/3
    assert(math.abs(TextKernels.shingleJaccard("a b c d", "a b c e", 3) - 1.0 / 3) < 1e-12)
  }

  test("minHashSig: deterministic, sensitive to content, estimates jaccard") {
    val a = TextKernels.minHashSig("the quick brown fox jumps over the lazy dog", 3, 128, 42L)
    val b = TextKernels.minHashSig("the quick brown fox jumps over the lazy cat", 3, 128, 42L)
    val c = TextKernels.minHashSig("completely different words entirely here now", 3, 128, 42L)
    assert(a.toSeq === TextKernels.minHashSig("the quick brown fox jumps over the lazy dog", 3, 128, 42L).toSeq)
    val simAB = a.zip(b).count { case (x, y) => x == y } / 128.0
    val simAC = a.zip(c).count { case (x, y) => x == y } / 128.0
    assert(simAB > simAC, s"$simAB vs $simAC")
    val exactAB = TextKernels.shingleJaccard(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat", 3)
    assert(math.abs(simAB - exactAB) < 0.25) // 128 hashes -> rough estimate
  }

  test("simHash64: near-identical texts land within small hamming distance") {
    val a = TextKernels.simHash64("alpha beta gamma delta epsilon zeta eta theta")
    val b = TextKernels.simHash64("alpha beta gamma delta epsilon zeta eta iota")
    val c = TextKernels.simHash64("one two three four five six seven eight")
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("fingerprint64 normalizes case and whitespace runs") {
    val f = TextKernels.fingerprint64 _
    assert(f("Hello  World") === f("hello world"))
    assert(f(" hello\tworld ") === f("hello world"))
    assert(f("hello world") !== f("hello word"))
  }

  test("cdcChunks: reassembly, size bounds, determinism") {
    val rnd = new scala.util.Random(7)
    val text = (0 until 5000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val chunks = TextKernels.cdcChunks(text, 16, 0xFFL, 64, 1024)
    assert(chunks.mkString === text)
    chunks.dropRight(1).foreach { c =>
      assert(c.length >= 64 && c.length <= 1024, s"len=${c.length}")
    }
    assert(chunks.last.length <= 1024)
    assert(chunks.toSeq === TextKernels.cdcChunks(text, 16, 0xFFL, 64, 1024).toSeq)
    assert(TextKernels.cdcChunks("", 16, 0xFFL, 64, 1024).isEmpty)
    // a doc shorter than minSize is a single chunk
    assert(TextKernels.cdcChunks("short", 16, 0xFFL, 64, 1024).toSeq === Seq("short"))
  }

  test("cdcChunks: boundaries realign after a prefix edit (insertion robustness)") {
    val rnd = new scala.util.Random(11)
    val text = (0 until 8000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "INSERTED-PREFIX-" + text
    val a = TextKernels.cdcChunks(text, 16, 0xFFL, 64, 1024)
    val b = TextKernels.cdcChunks(edited, 16, 0xFFL, 64, 1024)
    // after the first few chunks the cut points must coincide again:
    // the suffix chunk multiset overlap is large, unlike fixed-width
    val setA = a.toSet
    val shared = b.count(setA.contains)
    assert(shared >= a.length - 3,
      s"only $shared of ${a.length} chunks realigned after a prefix edit")
    // fixed-width chunking by contrast realigns nowhere (sanity contrast)
    val fw = text.grouped(256).toArray
    val fwEdited = edited.grouped(256).toArray.toSet
    assert(fw.count(fwEdited.contains) <= 1)
  }

  test("cdcChunks: maxSize forces a cut when the hash never fires") {
    // mask so strict no boundary fires -> every chunk exactly maxSize
    val text = "a" * 1000
    val chunks = TextKernels.cdcChunks(text, 16, (1L << 60) - 1, 10, 100)
    assert(chunks.dropRight(1).forall(_.length == 100))
    assert(chunks.mkString === text)
  }

  test("langId picks profiles and CJK") {
    assert(TextKernels.langId("the cat sat on the mat and it is a cat") === "en")
    assert(TextKernels.langId("der Hund ist nicht in das Haus und die Katze") === "de")
    assert(TextKernels.langId("le chat est dans la maison et les chiens") === "fr")
    assert(TextKernels.langId("el perro es un animal y la casa es una") === "es")
    assert(TextKernels.langId("你好世界这是中文") === "zh")
    assert(TextKernels.langId("こんにちは せかい です") === "ja")
    assert(TextKernels.langId("日本語のテキストです") === "ja") // Han + kana mix
    assert(TextKernels.langId("안녕하세요 세계 입니다") === "ko")
    assert(TextKernels.langId("qwerty zxcvb 12345") === "und")
  }
}
