package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  import TextAnalysis._
  import Fingerprints._

  test("wsTokenCount") {
    assert(wsTokenCount("") == 0)
    assert(wsTokenCount("  a  b\tc\nd ") == 4)
  }

  test("bpeishTokenCount deterministic and sane") {
    assert(bpeishTokenCount("hello world") == 2)
    assert(bpeishTokenCount("hello, world!") == 4)
    assert(bpeishTokenCount("internationalization") == 4) // 20 letters -> ceil-ish pieces
    assert(bpeishTokenCount("1234567") == 3)
    assert(bpeishTokenCount("CamelCaseWord") == 3)
  }

  test("language detection: stopword voting + scripts") {
    assert(detectLanguage("the cat and the dog sat on the mat for a while")._1 == "en")
    assert(detectLanguage("der Hund und die Katze ist nicht mit von")._1 == "de")
    assert(detectLanguage("el perro y la casa es que no con para una")._1 == "es")
    assert(detectLanguage("这是一个中文句子没有空格")._1 == "zh")
    assert(detectLanguage("12345 !!!")._1 == "und")
  }

  test("quality score in [0,1]; garbage scores below clean prose") {
    val clean = quality("The quick brown fox jumps over the lazy dog and runs far away into the woods for the evening.")
    val junk = quality("@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( ))))")
    assert(clean.score > junk.score)
    assert(clean.score >= 0 && clean.score <= 1)
    assert(junk.score >= 0 && junk.score <= 1)
  }

  test("minhash similarity approximates jaccard") {
    val a = "the quick brown fox jumps over the lazy dog " * 20
    val b = "the quick brown fox leaps over the lazy dog " * 20
    val c = "completely different content about spark engines and shuffles " * 20
    val (sa, sb, sc) = (charShingles(a), charShingles(b), charShingles(c))
    val jAB = jaccard(sa, sb)
    val estAB = minHashSimilarity(minHash(sa), minHash(sb))
    assert(math.abs(jAB - estAB) < 0.2)
    assert(minHashSimilarity(minHash(sa), minHash(sc)) < 0.2)
    assert(minHashSimilarity(minHash(sa), minHash(sa)) == 1.0)
  }

  test("lsh bands collide for near-dups, not for far docs") {
    val a = "the quick brown fox jumps over the lazy dog " * 20
    val b = a.replace("quick", "quikc")
    val c = "completely different content about spark engines and shuffles " * 20
    val bandsA = lshBands(minHash(charShingles(a))).toSet
    val bandsB = lshBands(minHash(charShingles(b))).toSet
    val bandsC = lshBands(minHash(charShingles(c))).toSet
    assert(bandsA.intersect(bandsB).nonEmpty)
    assert(bandsA.intersect(bandsC).isEmpty)
  }

  test("simhash hamming distance small for near-dups, large for far docs") {
    val a = "the quick brown fox jumps over the lazy dog and then sleeps deeply"
    val b = a.replace("sleeps", "rests")
    val c = "shuffle partitions broadcast join skew salt executor memory spill codegen"
    assert(hammingDistance(simHash(a), simHash(b)) <= 12)
    assert(hammingDistance(simHash(a), simHash(c)) > 12)
  }

  test("winnowing fingerprints overlap for shared substrings") {
    val shared = "a very long shared passage that appears verbatim in both documents with enough length"
    val a = "prefix one " + shared + " suffix alpha"
    val b = "different opening " + shared + " other ending"
    val fa = winnow(a).toSet
    val fb = winnow(b).toSet
    assert(fa.intersect(fb).size >= 3)
  }

  test("cosine and rhp bucket") {
    val v1 = Array(1.0f, 0.0f, 0.0f)
    val v2 = Array(1.0f, 0.01f, 0.0f)
    val v3 = Array(-1.0f, 0.0f, 0.0f)
    assert(cosine(v1, v2) > 0.99)
    assert(cosine(v1, v3) == -1.0)
    assert(rhpBucket(v1) == rhpBucket(v1))
    assert(rhpBucket(v1) != rhpBucket(v3))
  }
}
