package graft.synth

/** Deterministic per-language vocabularies for the synthetic
  * image+caption fixture (FIXTURES.md §1) and for the langid training
  * corpus. Five accepted languages (skewed ~80% en to exercise salting)
  * plus a "wrong language" pool and a gibberish alphabet for fault
  * injection. All tokens are plain ASCII (zh as pinyin-like syllables) so
  * char-n-gram models see distinct distributions.
  */
object Vocab {
  val acceptedLangs: Array[String] = Array("en", "fr", "de", "es", "zh")

  /** Skewed language mix per FIXTURES.md (~80% one lang). */
  val langWeights: Array[(String, Double)] =
    Array("en" -> 0.80, "fr" -> 0.07, "de" -> 0.06, "es" -> 0.04, "zh" -> 0.03)

  val words: Map[String, Array[String]] = Map(
    "en" -> Array("the", "a", "photo", "of", "dog", "cat", "running", "on",
      "beach", "sunset", "mountain", "city", "street", "with", "person",
      "riding", "bicycle", "red", "blue", "green", "house", "tree", "river",
      "child", "playing", "ball", "under", "bright", "sky", "and", "old",
      "wooden", "bridge", "over", "water", "small", "bird", "sitting"),
    "fr" -> Array("le", "la", "une", "photo", "de", "chien", "chat", "qui",
      "court", "sur", "plage", "coucher", "soleil", "montagne", "ville",
      "rue", "avec", "personne", "velo", "rouge", "bleu", "vert", "maison",
      "arbre", "riviere", "enfant", "jouant", "ballon", "sous", "ciel",
      "et", "vieux", "pont", "bois", "eau", "petit", "oiseau", "assis"),
    "de" -> Array("der", "die", "das", "ein", "foto", "von", "hund", "katze",
      "laufend", "am", "strand", "sonnenuntergang", "berg", "stadt",
      "strasse", "mit", "person", "fahrrad", "rot", "blau", "gruen", "haus",
      "baum", "fluss", "kind", "spielt", "ball", "unter", "hellem", "himmel",
      "und", "alte", "bruecke", "holz", "wasser", "kleiner", "vogel"),
    "es" -> Array("el", "la", "una", "foto", "de", "perro", "gato", "que",
      "corre", "en", "playa", "atardecer", "montana", "ciudad", "calle",
      "con", "persona", "bicicleta", "rojo", "azul", "verde", "casa",
      "arbol", "rio", "nino", "jugando", "pelota", "bajo", "cielo",
      "brillante", "y", "viejo", "puente", "madera", "agua", "pajaro"),
    "zh" -> Array("zhaopian", "gou", "mao", "paobu", "haitan", "riluo",
      "shan", "chengshi", "jiedao", "ren", "zixingche", "hongse", "lanse",
      "lvse", "fangzi", "shu", "he", "haizi", "wan", "qiu", "tiankong",
      "lao", "qiao", "mutou", "shui", "xiao", "niao", "zuozhe", "de",
      "zai", "shang", "xia", "yige", "mei", "da", "feng")
  )

  /** Fault class `wrong_lang`: transliterated tokens outside the accepted
    * set (ru-like). */
  val wrongLangWords: Array[String] = Array("sobaka", "koshka", "begushchaya",
    "plyazh", "zakat", "gora", "gorod", "ulitsa", "chelovek", "velosiped",
    "krasnyy", "siniy", "zelenyy", "dom", "derevo", "reka", "rebenok",
    "igrayet", "myach", "nebo", "staryy", "most", "voda", "ptitsa",
    "fotografiya", "utrom", "vecherom", "zimoy", "letom", "vesnoy")

  val gibberishAlphabet: String = "bcdfghjklmnpqrstvwxz"
}
