package graft.analysis

/** From-scratch reader + inference for quantized fastText supervised models
  * (`.ftz`), built to run the public `lid.176.ftz` language-identification
  * model the reference loads at `analysis/language.py:10-26` (path configured
  * in `settings.py:16`). 176 languages vs the 29 of the trigram fallback.
  *
  * The `.ftz` format is public (fastText is BSD-licensed; Joulin et al.,
  * "Bag of Tricks for Efficient Text Classification" and "FastText.zip:
  * Compressing text classification models"): little-endian stream of
  *   magic(i32)=0x2F4F16BA, version(i32)=12,
  *   args (12×i32 + t:f64),
  *   dictionary: size/nwords/nlabels(i32), ntokens/pruneidx_size(i64),
  *     `size` entries of (utf8 word, NUL, count:i64, type:i8),
  *     `pruneidx_size` (i32,i32) pairs remapping pruned ngram buckets,
  *   quant flag, quantized input matrix (product-quantizer codes +
  *   centroids, optional row-norm quantizer), qout flag, plain output
  *   matrix (for lid.176: 176×16 f32).
  *
  * lid.176 is trained with hierarchical-softmax loss (`args.loss == 1`), so
  * prediction walks a Huffman tree built over the label counts exactly like
  * fastText's `Model::buildTree`. We use exact log/sigmoid instead of
  * fastText's 512-entry lookup tables — probabilities agree to ~1e-3, which
  * the 0.6 decision threshold (`language.py:7`) never notices.
  *
  * Scale design: the decoded model is ~3.4 MB of primitive arrays, loaded
  * lazily ONCE per executor JVM (`FastTextLid.get`) from a local path — on a
  * real cluster ship the 0.9 MB `.ftz` with `spark-submit --files` and point
  * `GRAFT_LID_MODEL` at it. `predict` is a pure CPU function safe inside
  * `mapPartitions`; no task ever serializes the model.
  */
final class FastTextLid private (
    val dim: Int,
    minn: Int,
    maxn: Int,
    bucket: Int,
    wordNgrams: Int,
    nwords: Int,
    nlabels: Int,
    pruneidxSize: Long,
    pruneidx: java.util.HashMap[Integer, Integer],
    word2id: java.util.HashMap[String, Integer],
    wordSubwords: Array[Array[Int]], // precomputed per in-vocab word
    labelTypes: Array[Boolean],      // dict id -> is-label
    val labels: Array[String],       // "__label__xx" stripped
    rows: Array[Float],              // decoded input matrix, m×dim
    out: Array[Float],               // output matrix, nlabels×dim
    treeLeft: Array[Int], treeRight: Array[Int]) extends Serializable {

  private val EOS = "</s>"

  // --- fastText's FNV-1a with the int8_t sign-extension quirk ------------
  private def ftHash(bytes: Array[Byte], from: Int, until: Int): Int = {
    var h = 0x811c9dc5 // 2166136261
    var i = from
    while (i < until) {
      h = (h ^ bytes(i).toInt) * 16777619 // byte sign-extends like int8_t
      i += 1
    }
    h
  }

  private def pushHash(acc: scala.collection.mutable.ArrayBuffer[Int], id0: Int): Unit = {
    if (pruneidxSize == 0 || id0 < 0) return
    var id = id0
    if (pruneidxSize > 0) {
      val r = pruneidx.get(Integer.valueOf(id))
      if (r == null) return
      id = r.intValue()
    }
    acc += nwords + id
  }

  /** Char-ngram hashes of `<word>` (UTF-8 aware, `dictionary.cc`
    * computeSubwords): ngrams of minn..maxn characters, pruned through
    * pruneidx. */
  private[analysis] def computeSubwords(word: String,
      acc: scala.collection.mutable.ArrayBuffer[Int]): Unit = {
    val b = ("<" + word + ">").getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val len = b.length
    var i = 0
    while (i < len) {
      if ((b(i) & 0xc0) != 0x80) {
        var j = i
        var n = 1
        while (j < len && n <= maxn) {
          j += 1
          while (j < len && (b(j) & 0xc0) == 0x80) j += 1
          if (n >= minn && !(n == 1 && (i == 0 || j == len))) {
            val h = ((ftHash(b, i, j).toLong & 0xffffffffL) % bucket).toInt
            pushHash(acc, h)
          }
          n += 1
        }
      }
      i += 1
    }
  }

  /** Token → input-matrix row ids (`Dictionary::getLine` for supervised
    * prediction): in-vocab words use precomputed subwords, OOV words hash
    * their char-ngrams, label tokens are skipped, EOS appended. */
  private def getLine(text: String): Array[Int] = {
    val acc = new scala.collection.mutable.ArrayBuffer[Int](64)
    val hashes = new scala.collection.mutable.ArrayBuffer[Int](32)
    val toks = text.split("[ \t\n\u000b\f\r\u0000]+")
    var ti = 0
    while (ti <= toks.length) { // trailing slot = EOS
      val tok = if (ti == toks.length) EOS else toks(ti)
      if (tok.nonEmpty) {
        val wid = word2id.get(tok)
        if (wid != null) {
          val w = wid.intValue()
          if (!labelTypes(w)) {
            acc ++= wordSubwords(w)
            val tb = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            hashes += ftHash(tb, 0, tb.length)
          }
        } else if (!tok.startsWith("__label__") && tok != EOS) {
          computeSubwords(tok, acc)
          val tb = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          hashes += ftHash(tb, 0, tb.length)
        }
      }
      ti += 1
    }
    // word-ngram hashes (`Dictionary::addWordNgrams`); lid.176 has
    // wordNgrams=1 so this is a no-op there, kept for format generality
    var i = 0
    while (i < hashes.length) {
      var h = hashes(i).toLong & 0xffffffffL
      var j = i + 1
      while (j < hashes.length && j < i + wordNgrams) {
        h = h * 116049371L + (hashes(j).toLong & 0xffffffffL)
        pushHash(acc, (java.lang.Long.remainderUnsigned(h, bucket.toLong)).toInt)
        j += 1
      }
      i += 1
    }
    acc.toArray
  }

  /** Top-k (label, probability), hierarchical-softmax DFS over the Huffman
    * tree (`Model::dfs`). */
  def predict(text: String, k: Int = 1): Seq[(String, Double)] = {
    val line = getLine(text)
    if (line.isEmpty) return Seq.empty
    val h = new Array[Double](dim)
    var i = 0
    while (i < line.length) {
      val base = line(i) * dim
      var d = 0
      while (d < dim) { h(d) += rows(base + d); d += 1 }
      i += 1
    }
    var d = 0
    while (d < dim) { h(d) /= line.length; d += 1 }

    val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), Double](-_._1)) // min-heap on score
    def dfs(node: Int, score: Double): Unit = {
      if (heap.size == k && score < heap.head._1) return
      if (treeLeft(node) == -1 && treeRight(node) == -1) {
        heap.enqueue((score, node))
        if (heap.size > k) heap.dequeue()
        return
      }
      val row = (node - nlabels) * dim
      var s = 0.0
      var j = 0
      while (j < dim) { s += h(j) * out(row + j); j += 1 }
      val f = 1.0 / (1.0 + math.exp(-s))
      dfs(treeLeft(node), score + math.log(1.0 - f + 1e-307))
      dfs(treeRight(node), score + math.log(f + 1e-307))
    }
    dfs(2 * nlabels - 2, 0.0)
    val drained: Seq[(Double, Int)] = heap.dequeueAll
    drained.reverse.map(p => (labels(p._2), math.exp(p._1)))
  }

  /** `detect_languages` parity (`language.py:10-26`): top-1, kept only when
    * probability exceeds THRESHOLD=0.6, label prefix stripped. */
  def detect(text: String): Option[(String, Double)] =
    predict(text, 1).headOption.filter(_._2 > FastTextLid.Threshold)
}

object FastTextLid {

  /** `language.py:7` THRESHOLD. */
  val Threshold = 0.6

  val Magic = 0x2f4f16ba

  def load(path: String): FastTextLid = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt() == Magic, "not a fastText model")
    val version = bb.getInt()
    require(version <= 12, s"unsupported fastText version $version")
    val dim = bb.getInt()
    bb.getInt() // ws
    bb.getInt() // epoch
    bb.getInt() // minCount
    bb.getInt() // neg
    val wordNgrams = bb.getInt()
    val loss = bb.getInt()
    val model = bb.getInt()
    val bucket = bb.getInt()
    val minn = bb.getInt()
    val maxn = bb.getInt()
    bb.getInt()    // lrUpdateRate
    bb.getDouble() // t
    require(model == 3, "not a supervised model")
    require(loss == 1, "only hierarchical-softmax prediction implemented")

    val size = bb.getInt()
    val nwords = bb.getInt()
    val nlabels = bb.getInt()
    bb.getLong() // ntokens
    val pruneidxSize = bb.getLong()

    val wordStrs = new Array[String](size)
    val counts = new Array[Long](size)
    val types = new Array[Byte](size)
    val sb = new java.io.ByteArrayOutputStream(32)
    var i = 0
    while (i < size) {
      sb.reset()
      var c = bb.get()
      while (c != 0) { sb.write(c); c = bb.get() }
      wordStrs(i) = new String(sb.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      counts(i) = bb.getLong()
      types(i) = bb.get()
      i += 1
    }
    val pruneidx = new java.util.HashMap[Integer, Integer](
      math.max(16, (pruneidxSize * 2).toInt))
    var p = 0L
    while (p < pruneidxSize) {
      val a = bb.getInt(); val b = bb.getInt()
      pruneidx.put(Integer.valueOf(a), Integer.valueOf(b))
      p += 1
    }

    val quantInput = bb.get() != 0
    require(quantInput, "expected a quantized (.ftz) input matrix")
    // QMatrix::load
    val qnorm = bb.get() != 0
    val m = bb.getLong().toInt
    val n = bb.getLong().toInt
    require(n == dim)
    val codesize = bb.getInt()
    val codes = new Array[Byte](codesize)
    bb.get(codes)
    // ProductQuantizer::load
    val pqDim = bb.getInt(); val nsubq = bb.getInt()
    val dsub = bb.getInt(); val lastdsub = bb.getInt()
    require(pqDim == dim)
    val centroids = new Array[Float](pqDim * 256)
    bb.asFloatBuffer().get(centroids); bb.position(bb.position() + 4 * centroids.length)
    var normCodes: Array[Byte] = null
    var normCentroids: Array[Float] = null
    if (qnorm) {
      normCodes = new Array[Byte](m)
      bb.get(normCodes)
      val ndim = bb.getInt(); bb.getInt(); bb.getInt(); bb.getInt()
      normCentroids = new Array[Float](ndim * 256)
      bb.asFloatBuffer().get(normCentroids)
      bb.position(bb.position() + 4 * normCentroids.length)
    }
    val qout = bb.get() != 0
    require(!qout, "quantized output matrix not implemented (lid.176 has qout=false)")
    val om = bb.getLong().toInt
    val on = bb.getLong().toInt
    require(on == dim && om >= nlabels - 1)
    val out = new Array[Float](om * on)
    bb.asFloatBuffer().get(out)

    // Decode the PQ input matrix once into a flat float array — trades
    // ~3.2 MB for table lookups instead of per-token PQ arithmetic.
    val rows = new Array[Float](m * dim)
    var t = 0
    while (t < m) {
      val alpha = if (qnorm) normCentroids(normCodes(t) & 0xff) else 1.0f
      var sq = 0
      while (sq < nsubq) {
        val dd = if (sq == nsubq - 1) lastdsub else dsub
        val c0 = (sq * 256 + (codes(nsubq * t + sq) & 0xff)) * dsub
        var k = 0
        while (k < dd) {
          rows(t * dim + sq * dsub + k) = alpha * centroids(c0 + k)
          k += 1
        }
        sq += 1
      }
      t += 1
    }

    // Huffman tree over label counts (`Model::buildTree`); labels are dict
    // entries nwords..size-1 in stored (count-descending) order.
    val osz = nlabels
    val treeCount = new Array[Long](2 * osz - 1)
    val treeLeft = Array.fill(2 * osz - 1)(-1)
    val treeRight = Array.fill(2 * osz - 1)(-1)
    val treeParent = Array.fill(2 * osz - 1)(-1)
    i = 0
    while (i < 2 * osz - 1) { treeCount(i) = 1000000000000000L; i += 1 }
    i = 0
    while (i < osz) { treeCount(i) = counts(nwords + i); i += 1 }
    var leaf = osz - 1
    var node = osz
    i = osz
    while (i < 2 * osz - 1) {
      val mini = new Array[Int](2)
      var j = 0
      while (j < 2) {
        if (leaf >= 0 && (node >= 2 * osz - 1 || treeCount(leaf) < treeCount(node))) {
          mini(j) = leaf; leaf -= 1
        } else {
          mini(j) = node; node += 1
        }
        j += 1
      }
      treeLeft(i) = mini(0); treeRight(i) = mini(1)
      treeCount(i) = treeCount(mini(0)) + treeCount(mini(1))
      treeParent(mini(0)) = i; treeParent(mini(1)) = i
      i += 1
    }

    val word2id = new java.util.HashMap[String, Integer](size * 2)
    i = 0
    while (i < size) { word2id.put(wordStrs(i), Integer.valueOf(i)); i += 1 }
    val labelTypes = types.map(_ == 1.toByte)
    val labels = (0 until nlabels).map(k =>
      wordStrs(nwords + k).stripPrefix("__label__")).toArray

    // initNgrams: precompute pruned subwords per in-vocab word (EOS: id
    // only). The shared array is filled in place after construction.
    val subs = new Array[Array[Int]](size)
    val lid = new FastTextLid(dim, minn, maxn, bucket, wordNgrams, nwords,
      nlabels, pruneidxSize, pruneidx, word2id, subs,
      labelTypes, labels, rows, out, treeLeft, treeRight)
    i = 0
    while (i < size) {
      val acc = new scala.collection.mutable.ArrayBuffer[Int](8)
      acc += i
      if (wordStrs(i) != "</s>" && !labelTypes(i)) lid.computeSubwords(wordStrs(i), acc)
      subs(i) = acc.toArray
      i += 1
    }
    lid
  }

  /** Default model location: `GRAFT_LID_MODEL` env (set it to the
    * `--files`-shipped path on a cluster), falling back to the reference's
    * copy of the public model in this sandbox. */
  def defaultPath: String =
    sys.env.getOrElse("GRAFT_LID_MODEL", "/root/reference/data/lid.176.ftz")

  @volatile private var cached: Option[FastTextLid] = null

  /** Executor-JVM singleton; None when no model file is present (callers
    * fall back to the trigram scorer). */
  def get: Option[FastTextLid] = {
    var c = cached
    if (c == null) synchronized {
      c = cached
      if (c == null) {
        c = if (new java.io.File(defaultPath).isFile)
          try Some(load(defaultPath)) catch { case _: Exception => None }
        else None
        cached = c
      }
    }
    c
  }

  /** Held-out multilingual gate corpus: one sentence per language, written
    * for this project (NOT from any training set) and pinned to the model's
    * own confident (>0.7) top-1 prediction — the `t_lang_id` oracle and the
    * LangIdSpec accuracy floor both iterate this. 69 languages spanning 20+
    * scripts (vs 29 for the trigram fallback). */
  val heldOut: Vector[(String, String)] = Vector(
    "am" -> "ዛሬ የአየር ሁኔታው ፀሐያማ ነው እና ከእራት በፊት በመናፈሻው ውስጥ ለመራመድ እቅድ አለን",
    "ar" -> "الطقس مشمس اليوم ونخطط للمشي في الحديقة قبل العشاء",
    "az" -> "bu gün hava günəşlidir və axşam yeməyindən əvvəl parkda gəzməyi planlaşdırırıq",
    "be" -> "надвор'е сёння вельмі прыгожае і сонечнае таму мы збіраемся перад вячэрай прагуляцца па гарадскім парку і паглядзець кветкі якія садоўнікі пасадзілі на мінулым тыдні",
    "bg" -> "времето днес е слънчево и планираме да се разходим из парка преди вечеря",
    "bn" -> "আজ আবহাওয়া রৌদ্রোজ্জ্বল এবং আমরা রাতের খাবারের আগে পার্কে হাঁটার পরিকল্পনা করছি",
    "ca" -> "el temps avui és assolellat i tenim previst passejar pel parc abans de sopar",
    "cs" -> "počasí je dnes slunečné a plánujeme se před večeří projít parkem",
    "cy" -> "mae'r tywydd yn heulog heddiw ac rydym yn bwriadu cerdded trwy'r parc cyn swper",
    "da" -> "vejret er solrigt i dag og vi planlægger at gå en tur gennem parken før aftensmaden",
    "de" -> "das wetter ist heute sonnig und wir wollen vor dem abendessen durch den park spazieren",
    "el" -> "ο καιρός σήμερα είναι ηλιόλουστος και σκοπεύουμε να περπατήσουμε στο πάρκο πριν το δείπνο",
    "en" -> "the weather today is sunny and we plan to walk through the park before dinner",
    "eo" -> "la vetero hodiaŭ estas suna kaj ni planas promeni tra la parko antaŭ la vespermanĝo",
    "es" -> "el clima está soleado hoy y planeamos caminar por el parque antes de la cena",
    "et" -> "täna on ilm päikeseline ja plaanime enne õhtusööki pargis jalutada",
    "eu" -> "gaur eguraldia eguzkitsua da eta afaldu aurretik parkean paseatzea pentsatzen dugu",
    "fa" -> "امروز هوا آفتابی است و قصد داریم قبل از شام در پارک قدم بزنیم",
    "fi" -> "sää on tänään aurinkoinen ja aiomme kävellä puiston läpi ennen illallista",
    "fr" -> "le temps est ensoleillé aujourd'hui et nous prévoyons de marcher dans le parc avant le dîner",
    "ga" -> "tá an aimsir grianmhar inniu agus tá sé beartaithe againn siúl tríd an bpáirc roimh an dinnéar",
    "gu" -> "આજે હવામાન તડકાવાળું છે અને અમે રાત્રિભોજન પહેલાં બગીચામાં ચાલવાની યોજના બનાવીએ છીએ",
    "he" -> "מזג האוויר היום שמשי ואנחנו מתכננים ללכת בפארק לפני ארוחת הערב",
    "hi" -> "आज मौसम धूप वाला है और हम रात के खाने से पहले पार्क में टहलने की योजना बना रहे हैं",
    "hr" -> "vrijeme je danas vrlo lijepo i sunčano pa ćemo prije večere prošetati gradskim parkom i pogledati cvijeće koje su vrtlari posadili prošloga tjedna",
    "hu" -> "ma napos az idő és azt tervezzük hogy vacsora előtt sétálunk a parkban",
    "hy" -> "այսօր եղանակը արևոտ է և մենք նախատեսում ենք ընթրիքից առաջ զբոսնել այգում",
    "id" -> "cuaca hari ini cerah dan kami berencana berjalan-jalan di taman sebelum makan malam",
    "is" -> "veðrið er sólríkt í dag og við ætlum að ganga í gegnum garðinn fyrir kvöldmat",
    "it" -> "oggi il tempo è soleggiato e abbiamo intenzione di passeggiare nel parco prima di cena",
    "ja" -> "今日は天気が良いので夕食の前に公園を散歩する予定です",
    "ka" -> "დღეს ამინდი მზიანია და ვგეგმავთ ვახშმამდე პარკში გასეირნებას",
    "kk" -> "бүгін ауа райы шуақты және біз кешкі асқа дейін саябақта серуендеуді жоспарлап отырмыз",
    "km" -> "ថ្ងៃនេះអាកាសធាតុមានពន្លឺថ្ងៃ ហើយយើងគ្រោងដើរលេងនៅសួនច្បារមុនអាហារពេលល្ងាច",
    "kn" -> "ಇಂದು ಹವಾಮಾನ ಬಿಸಿಲಿನಿಂದ ಕೂಡಿದೆ ಮತ್ತು ರಾತ್ರಿ ಊಟಕ್ಕೆ ಮೊದಲು ಉದ್ಯಾನದಲ್ಲಿ ನಡೆಯಲು ಯೋಜಿಸುತ್ತಿದ್ದೇವೆ",
    "ko" -> "오늘은 날씨가 화창해서 저녁 식사 전에 공원을 산책할 계획입니다",
    "ky" -> "бүгүн аба ырайы күнөстүү жана биз кечки тамактан мурун паркта сейилдөөнү пландап жатабыз",
    "lo" -> "ມື້ນີ້ອາກາດແຈ່ມໃສ ແລະພວກເຮົາວາງແຜນຍ່າງຫຼິ້ນໃນສວນກ່ອນອາຫານແລງ",
    "lt" -> "šiandien oras saulėtas ir mes planuojame pasivaikščioti parke prieš vakarienę",
    "lv" -> "šodien laiks ir saulains un mēs plānojam pastaigāties pa parku pirms vakariņām",
    "mk" -> "времето денес е многу убаво и сончево затоа планираме пред вечерата да прошетаме низ градскиот парк и да ги погледнеме цвеќињата што градинарите ги посадија минатата недела",
    "ml" -> "ഇന്ന് കാലാവസ്ഥ വെയിലാണ്, അത്താഴത്തിന് മുമ്പ് പാർക്കിൽ നടക്കാൻ ഞങ്ങൾ പദ്ധതിയിടുന്നു",
    "mn" -> "өнөөдөр цаг агаар нартай байна, бид оройн хоолны өмнө цэцэрлэгт хүрээлэнгээр зугаалахаар төлөвлөж байна",
    "mr" -> "आज हवामान सूर्यप्रकाशित आहे आणि आम्ही रात्रीच्या जेवणापूर्वी उद्यानात फिरण्याची योजना करत आहोत",
    "my" -> "ဒီနေ့ရာသီဥတုက နေသာပြီး ညစာမစားခင် ပန်းခြံထဲမှာ လမ်းလျှောက်ဖို့ စီစဉ်နေကြတယ်",
    "ne" -> "आज मौसम घमाइलो छ र हामी बेलुकाको खाना अघि पार्कमा हिँड्ने योजना गर्दैछौं",
    "nl" -> "het weer is vandaag zonnig en we zijn van plan om voor het avondeten door het park te wandelen",
    "no" -> "været er solfylt i dag og vi planlegger å gå gjennom parken før middagen",
    "pa" -> "ਅੱਜ ਮੌਸਮ ਧੁੱਪ ਵਾਲਾ ਹੈ ਅਤੇ ਅਸੀਂ ਰਾਤ ਦੇ ਖਾਣੇ ਤੋਂ ਪਹਿਲਾਂ ਪਾਰਕ ਵਿੱਚ ਸੈਰ ਕਰਨ ਦੀ ਯੋਜਨਾ ਬਣਾ ਰਹੇ ਹਾਂ",
    "pl" -> "pogoda jest dziś słoneczna i planujemy spacer po parku przed kolacją",
    "pt" -> "o tempo está ensolarado hoje e planejamos caminhar pelo parque antes do jantar",
    "ro" -> "vremea este însorită astăzi și plănuim să ne plimbăm prin parc înainte de cină",
    "ru" -> "погода сегодня солнечная и мы планируем прогуляться по парку перед ужином",
    "si" -> "අද කාලගුණය හිරු සහිතයි, රාත්‍රී ආහාරයට පෙර උද්‍යානයේ ඇවිදීමට අපි සැලසුම් කරමු",
    "sk" -> "počasie je dnes veľmi pekné a slnečné preto sa chystáme pred večerou prejsť cez mestský park a pozrieť si kvety ktoré tam minulý týždeň vysadili záhradníci",
    "sl" -> "vreme je danes zelo lepo in sončno zato se nameravamo pred večerjo sprehoditi skozi mestni park in si ogledati cvetlice ki so jih prejšnji teden posadili vrtnarji",
    "sq" -> "moti sot është me diell dhe planifikojmë të ecim nëpër park para darkës",
    "sr" -> "време је данас сунчано и планирамо да прошетамо парком пре вечере",
    "sv" -> "vädret är soligt idag och vi planerar att promenera genom parken före middagen",
    "sw" -> "hali ya hewa leo ni ya jua na tunapanga kutembea katika bustani kabla ya chakula cha jioni",
    "ta" -> "இன்று வானிலை வெயிலாக உள்ளது, இரவு உணவிற்கு முன் பூங்காவில் நடக்க திட்டமிட்டுள்ளோம்",
    "te" -> "ఈరోజు వాతావరణం ఎండగా ఉంది మరియు రాత్రి భోజనానికి ముందు పార్కులో నడవాలని ప్లాన్ చేస్తున్నాము",
    "th" -> "วันนี้อากาศแจ่มใสและเราวางแผนจะเดินเล่นในสวนสาธารณะก่อนอาหารเย็น",
    "tl" -> "maaraw ang panahon ngayon at plano naming maglakad sa parke bago ang hapunan",
    "tr" -> "bugün hava güneşli ve akşam yemeğinden önce parkta yürümeyi planlıyoruz",
    "uk" -> "погода сьогодні сонячна і ми плануємо прогулятися парком перед вечерею",
    "ur" -> "آج موسم دھوپ والا ہے اور ہم رات کے کھانے سے پہلے پارک میں چہل قدمی کا ارادہ رکھتے ہیں",
    "vi" -> "hôm nay trời nắng và chúng tôi dự định đi dạo trong công viên trước bữa tối",
    "zh" -> "今天 天气 很 好 我们 打算 吃 晚饭 之前 去 公园 散步 看看 美丽 的 风景")
}
