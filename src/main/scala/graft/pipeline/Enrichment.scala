package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns.{firstToken, fullName}

/** The reference's enrichment stage (/root/reference/dags/enrich.py) as
  * offline joins and array transforms — per-row HTTP becomes a join
  * against an enrichment snapshot table, positional `pd.concat` alignment
  * becomes a key join on `id` (deliberate divergence, SURVEY §7 risk 5).
  */
object Enrichment {

  /** J9 + F15 + F16 — merge old vs enriched author lists: sort both by
    * family, zip positionally, merge element-wise (enrich.py:205-213).
    * Both sides are array<struct<family, given, affiliation:string>>.
    *
    * Name merge (enrich.py:151-170): prefer the record with more
    * non-empty name parts; tie → longer UTF-8 encoding (octet_length).
    * Affiliation merge (enrich.py:172-190): prefer the longer string;
    * both empty → null.
    */
  def mergeAuthorLists(oldAuthors: Column, newAuthors: Column): Column = {
    val zipped = arrays_zip(
      array_sort(oldAuthors, (l, r) => compareFamilies(l, r)),
      array_sort(newAuthors, (l, r) => compareFamilies(l, r)))
    transform(zipped, z => mergeOne(z.getField("0"), z.getField("1")))
  }

  private def compareFamilies(l: Column, r: Column): Column =
    when(l.getField("family") < r.getField("family"), -1)
      .when(l.getField("family") > r.getField("family"), 1)
      .otherwise(0)

  private def nParts(a: Column): Column =
    when(length(coalesce(a.getField("family"), lit(""))) > 0, 1).otherwise(0) +
      when(length(coalesce(a.getField("given"), lit(""))) > 0, 1).otherwise(0)

  private def nBytes(a: Column): Column =
    octet_length(concat_ws(" ", coalesce(a.getField("family"), lit("")),
      coalesce(a.getField("given"), lit(""))))

  private def mergeOne(o: Column, n: Column): Column = {
    val pickNew = (nParts(n) > nParts(o)) ||
      (nParts(n) === nParts(o) && nBytes(n) > nBytes(o))
    val name = when(pickNew, n).otherwise(o)
    val oAff = coalesce(o.getField("affiliation"), lit(""))
    val nAff = coalesce(n.getField("affiliation"), lit(""))
    val aff = when(length(nAff) > length(oAff), nAff).otherwise(oAff)
    struct(
      name.getField("family").as("family"),
      name.getField("given").as("given"),
      when(length(aff) > 0, aff).otherwise(lit(null)).as("affiliation"))
  }

  /** F11 — gender classification as a broadcast dictionary join, not a
    * UDF. Dictionary rows: (name_lower, gender) with gender_guesser-style
    * labels; `mostly_female`/`mostly_male` fold to the bare label,
    * `andy` (androgynous) folds to unknown (enrich.py:57-64). Lookup key
    * is the first given-name token (enrich.py:49-52). */
  def assignGenders(papers: DataFrame, genderDict: DataFrame): DataFrame = {
    val exploded = papers.select(col("id"),
        posexplode(col("authors_merged")).as(Seq("pos", "a")))
      .withColumn("lookup", lower(firstToken(col("a.given"))))
    val folded = genderDict.select(lower(col("name")).as("lookup"),
      when(col("gender").isin("mostly_female"), "female")
        .when(col("gender").isin("mostly_male"), "male")
        .when(col("gender").isin("andy"), "unknown")
        .otherwise(col("gender")).as("gender"))
    val withGender = exploded
      .join(broadcast(folded), Seq("lookup"), "left")
      .withColumn("g", coalesce(col("gender"), lit("unknown")))
      .select(col("id"), col("pos"), struct(
        col("a.family").as("family"),
        col("a.given").as("given"),
        col("a.affiliation").as("affiliation"),
        col("g").as("gender"),
        fullName(col("a.given"), col("a.family")).as("full_name")).as("a"))
    withGender
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("a"))))
        .as("pa"))
      .select(col("id"), transform(col("pa"), x => x.getField("a"))
        .as("authors_merged"))
  }

  /** F19 — display-name parse heuristics (openalex.py:63-82), expressed
    * as a `when` chain rather than a UDF: "Family, Given" when a comma is
    * present; otherwise last token = family, rest = given; single token →
    * family only. Returns struct<family, given>. */
  def parseDisplayName(name: Column): Column = {
    val t = trim(name)
    val commaSplit = split(t, ",\\s*")
    val tokens = split(t, "\\s+")
    val n = size(tokens)
    when(t.contains(","), struct(
        trim(element_at(commaSplit, 1)).as("family"),
        trim(element_at(commaSplit, 2)).as("given")))
      .when(n === 1, struct(t.as("family"), lit(null).cast("string").as("given")))
      .otherwise(struct(
        element_at(tokens, -1).as("family"),
        array_join(slice(tokens, lit(1), n - 1), " ").as("given")))
  }

  /** F17 — collect non-null reference DOIs (enrich.py:74-80). */
  def referenceDois(refs: Column): Column =
    filter(transform(refs, r => r.getField("DOI")), x => x.isNotNull)

  /** F21 — subject selection: highest-score level-1 concept, falling back
    * to level-0 (openalex.py:96-105). Concepts:
    * array<struct<display_name, level, score>>. */
  def selectSubject(concepts: Column): Column = {
    // try_element_at: no level-1 concepts is normal OpenAlex data — an
    // ANSI element_at would throw and make the level-0 fallback unreachable
    def best(level: Int): Column =
      try_element_at(array_sort(
        filter(concepts, c => c.getField("level") === level),
        (l, r) => when(l.getField("score") > r.getField("score"), -1)
          .when(l.getField("score") < r.getField("score"), 1).otherwise(0)), lit(1))
        .getField("display_name")
    coalesce(best(1), best(0))
  }
}
