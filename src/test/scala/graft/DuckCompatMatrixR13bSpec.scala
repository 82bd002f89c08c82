package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Differential matrix for the r13 CSV SNIFFER (VERDICT r12 item 3):
  * option-free `read_csv('f.csv')` must parse exactly as the installed
  * DuckDB's auto-detection does. Seeded random tables (seed 1314) over
  * all four delimiter candidates × header/headerless × int/double/text
  * columns, plus quoted-field, single-column, and all-varchar cases;
  * every expected rendering below is the INSTALLED DuckDB's .df()
  * output on the same bytes. Ambiguous dialects REFUSE (DuckDB
  * tie-breaks by candidate order; this bridge never coin-flips a
  * parse). Rendering matches the other matrix specs. */
class DuckCompatMatrixR13bSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-duck-matrix-r13b")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def render(df: org.apache.spark.sql.DataFrame): String =
    df.columns.mkString(";") + "#" + df.collect().map { r =>
      (0 until r.length).map(i =>
        if (r.isNullAt(i)) "NULL" else String.valueOf(r.get(i)))
        .mkString(",")
    }.mkString("|")

  // (path, file content, DuckDB-expected rendering)
  private val Cases: Seq[(String, String, String)] = Seq(
    ("/tmp/sniffm/m0.csv", "id,name\n54.8,795\n53.3,732\n11.3,525\n",
      "id;name#54.8,795|53.3,732|11.3,525"),
    ("/tmp/sniffm/m1.csv", "name;score;city\n420;alpha;kappa\n294;sigma;beta\n553;beta;delta\n469;omega;omega\n",
      "name;score;city#420,alpha,kappa|294,sigma,beta|553,beta,delta|469,omega,omega"),
    ("/tmp/sniffm/m2.csv", "score|city|qty|rate\n73.7|-35|101|411\n62.8|713|72|332\n14.0|449|712|270\n17.1|480|736|-45\n51.6|656|149|452\n",
      "score;city;qty;rate#73.7,-35,101,411|62.8,713,72,332|14.0,449,712,270|17.1,480,736,-45|51.6,656,149,452"),
    ("/tmp/sniffm/m3.csv", "city\tqty\n136\t46\n669\t655\n909\t714\n",
      "city;qty#136,46|669,655|909,714"),
    ("/tmp/sniffm/m4.csv", "77.7,64.3,20.7\n74.8,13.8,39.9\n5.3,18.6,50.6\n68.2,5.5,11.5\n",
      "column0;column1;column2#77.7,64.3,20.7|74.8,13.8,39.9|5.3,18.6,50.6|68.2,5.5,11.5"),
    ("/tmp/sniffm/m5.csv", "delta;gamma;10;7.7\nsigma;kappa;124;79.6\ndelta;delta;101;7.8\nsigma;omega;453;47.0\ngamma;omega;168;32.1\n",
      "column0;column1;column2;column3#delta,gamma,10,7.7|sigma,kappa,124,79.6|delta,delta,101,7.8|sigma,omega,453,47.0|gamma,omega,168,32.1"),
    ("/tmp/sniffm/m6.csv", "beta|40.0\nalpha|8.3\nzeta|77.5\n",
      "column0;column1#beta,40.0|alpha,8.3|zeta,77.5"),
    ("/tmp/sniffm/m7.csv", "omega\t22.3\t29.8\nsigma\t14.3\t20.0\ndelta\t8.4\t59.4\nkappa\t28.5\t62.4\n",
      "column0;column1;column2#omega,22.3,29.8|sigma,14.3,20.0|delta,8.4,59.4|kappa,28.5,62.4"),
    ("/tmp/sniffm/m8.csv", "score,city,qty,rate\n254,75,70.1,42.2\n52,698,27.7,49.6\n372,161,60.0,13.3\n622,674,20.7,14.1\n-6,441,19.4,3.0\n",
      "score;city;qty;rate#254,75,70.1,42.2|52,698,27.7,49.6|372,161,60.0,13.3|622,674,20.7,14.1|-6,441,19.4,3.0"),
    ("/tmp/sniffm/m9.csv", "city;qty\n66.5;242\n77.3;669\n5.8;909\n",
      "city;qty#66.5,242|77.3,669|5.8,909"),
    ("/tmp/sniffm/m10.csv", "qty|rate|id\n26.6|57.6|117\n70.4|6.1|-39\n42.8|37.9|90\n21.5|80.6|917\n",
      "qty;rate;id#26.6,57.6,117|70.4,6.1,-39|42.8,37.9,90|21.5,80.6,917"),
    ("/tmp/sniffm/m11.csv", "rate\tid\tname\tscore\n719\t-12\t104\t773\n143\t509\t199\t738\n361\t83\t598\t650\n324\t148\t43\t813\n56\t634\t70\t72\n",
      "rate;id;name;score#719,-12,104,773|143,509,199,738|361,83,598,650|324,148,43,813|56,634,70,72"),
    ("/tmp/sniffm/m13.csv", "beta;kappa;sigma\nzeta;kappa;sigma\nbeta;beta;alpha\ndelta;beta;zeta\n",
      "beta;kappa;sigma#zeta,kappa,sigma|beta,beta,alpha|delta,beta,zeta"),
    ("/tmp/sniffm/sc_num.csv", "5\n6\n7\n",
      "column0#5|6|7"),
    ("/tmp/sniffm/sc_txt.csv", "hello\nworld\nfoo\n",
      "hello#world|foo"),
    ("/tmp/sniffm/q1.csv", "id;txt\n1;\"a;b\"\n2;\"c\"\"d\"\n",
      "id;txt#1,a;b|2,c\"d"),
    ("/tmp/sniffm/q2.csv", "a|b\n\"x|y\"|3\n\"z\"|4\n",
      "a;b#x|y,3|z,4"),
    ("/tmp/sniffm/q3.csv", "k,v\n\"1,5\",2\n\"3\",4\n",
      "k;v#1,5,2|3,4"))

  test("r13b sniffer matrix: every option-free read_csv answer equals " +
      "DuckDB's auto-detected parse") {
    graft.functions.DuckCompat.register(spark)
    Cases.foreach { case (path, content, want) =>
      val p = java.nio.file.Paths.get(path)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val got = render(DuckDialect.sql(spark, s"SELECT * FROM read_csv('$path')"))
      assert(got == want, s"\nfile: $path\n want: $want\n  got: $got")
    }
  }

  test("r13b sniffer refusals: ambiguous dialects and compressed files " +
      "refuse to explicit options, never coin-flip a parse") {
    graft.functions.DuckCompat.register(spark)
    val amb = java.nio.file.Paths.get("/tmp/sniffm/amb.csv")
    java.nio.file.Files.createDirectories(amb.getParent)
    java.nio.file.Files.write(amb, "a,b;c\nd,e;f\n".getBytes("UTF-8"))
    val e1 = intercept[Exception](
      DuckDialect.sql(spark, "SELECT * FROM read_csv('/tmp/sniffm/amb.csv')")
        .collect())
    assert(e1.getMessage.contains("ambiguous"), e1.getMessage)
    // r15: `.gz` and (third pass) `.zst` now sniff through a
    // decompressing sample read (DuckCompatMatrixR15Spec / R15bSpec);
    // the no-DuckDB-twin extensions keep the compressed-file refusal
    val e2 = intercept[Exception](
      DuckDialect.sql(spark, "SELECT * FROM read_csv('/tmp/sniffm/x.csv.bz2')")
        .collect())
    assert(e2.getMessage.contains("compressed"), e2.getMessage)
    // explicit options still take the pre-r13 path untouched
    val got = render(DuckDialect.sql(spark,
      "SELECT * FROM read_csv('/tmp/sniffm/m6.csv', header = false, delim = '|')"))
    assert(got == "column0;column1#beta,40.0|alpha,8.3|zeta,77.5")
  }
}
