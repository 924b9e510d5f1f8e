package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[MediaKernels]] — the byte-level media
  * construct/parse steps as codegen'd scan-side columns (same static-call
  * pattern as [[graft.functions.SketchExpressions]]: whole-stage codegen
  * stays unbroken, the JVM JIT owns the kernel loops). */
object MediaExpressions {

  /** (id, width, height) → complete 24bpp BMP file bytes. */
  case class BmpSynth(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "bmp_synth"

    override def nullSafeEval(id: Any, w: Any, h: Any): Any =
      MediaKernels.bmpSynth(id.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, w, h) =>
        s"graft.multimodal.MediaKernels.bmpSynth($i, $w, $h)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** BMP bytes → [width, height, bpp, file_size_declared, file_size_actual,
    * sum_b, sum_g, sum_r]; all(-1) when not a valid 24bpp BMP. */
  case class BmpParse(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bmp_parse"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.bmpParse(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.bmpParse($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** (id, channels, sampleRate, frames) → complete RIFF/WAVE PCM-16 bytes. */
  case class WavSynth(first: Expression, second: Expression, third: Expression,
                      fourth: Expression)
      extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "wav_synth"

    override def nullSafeEval(id: Any, ch: Any, rate: Any, fr: Any): Any =
      MediaKernels.wavSynth(id.asInstanceOf[Long], ch.asInstanceOf[Int],
        rate.asInstanceOf[Int], fr.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, c, r, f) =>
        s"graft.multimodal.MediaKernels.wavSynth($i, $c, $r, $f)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression, q: Expression): Expression =
      copy(first = f, second = s, third = t, fourth = q)
  }

  /** WAV bytes → [channels, sample_rate, bits, byte_rate, block_align,
    * data_bytes, duration_ms, sum_abs]; all(-1) when not PCM-16 RIFF. */
  case class WavParse(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "wav_parse"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.wavParse(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.wavParse($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** BMP bytes → [ok, dhash64]: 64-bit perceptual difference hash over
    * the decoded pixel grid ([[MediaKernels.bmpDhash]]); ok=0 when the
    * payload is not a valid 24bpp BMP. */
  case class BmpDhash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bmp_dhash"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.bmpDhash(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.bmpDhash($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** BMP bytes → BMP bytes with the first stored pixel's blue channel
    * bumped +1 mod 256 ([[MediaKernels.bmpPerturb]]) — the near-dup twin
    * generator; non-BMP payloads pass through unchanged. */
  case class BmpPerturb(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "bmp_perturb"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.bmpPerturb(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.bmpPerturb($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** WAV bytes → [ok, efp64]: 64-bit energy-contour fingerprint over the
    * decoded PCM frames ([[MediaKernels.wavEfp]]); ok=0 when the payload
    * is not PCM-16 RIFF/WAVE. */
  case class WavEfp(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "wav_efp"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.wavEfp(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.wavEfp($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** WAV bytes → WAV bytes with frame 0 / channel 0's int16 sample bumped
    * +1 mod 2¹⁶ ([[MediaKernels.wavPerturb]]) — the audio near-dup twin
    * generator; non-PCM16-WAV payloads pass through unchanged. */
  case class WavPerturb(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "wav_perturb"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.wavPerturb(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.wavPerturb($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** (id, width, height, frames, fpsMilli) → complete GVID raw-frame
    * video bytes. */
  case class VidSynth(id: Expression, w: Expression, h: Expression,
                      fr: Expression, fps: Expression)
      extends org.apache.spark.sql.catalyst.expressions.QuinaryExpression {
    override def children: Seq[Expression] = Seq(id, w, h, fr, fps)
    override def dataType: DataType = BinaryType
    override def prettyName: String = "vid_synth"

    override def nullSafeEval(i: Any, wv: Any, hv: Any, fv: Any, pv: Any): Any =
      MediaKernels.vidSynth(i.asInstanceOf[Long], wv.asInstanceOf[Int],
        hv.asInstanceOf[Int], fv.asInstanceOf[Int], pv.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, wv, hv, fv, pv) =>
        s"graft.multimodal.MediaKernels.vidSynth($i, $wv, $hv, $fv, $pv)")

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(id = newChildren(0), w = newChildren(1), h = newChildren(2),
        fr = newChildren(3), fps = newChildren(4))
  }

  /** GVID bytes → [width, height, frames, fps_milli, data_bytes,
    * duration_ms, sum_b, sum_g, sum_r]; all(-1) when not a well-formed
    * GVID. */
  case class VidParse(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "vid_parse"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.vidParse(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.vidParse($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** GVID bytes → [ok, sig64]: majority-vote-over-frames perceptual
    * dHash signature ([[MediaKernels.vidDhash]]); ok=0 when the payload
    * is not a well-formed GVID. */
  case class VidDhash(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "vid_dhash"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.vidDhash(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.vidDhash($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** GVID bytes → GVID bytes with frame 0's first pixel's blue channel
    * bumped +1 mod 256 ([[MediaKernels.vidPerturb]]) — the video
    * near-dup twin generator; non-GVID payloads pass through
    * unchanged. */
  case class VidPerturb(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "vid_perturb"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.vidPerturb(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.vidPerturb($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** (id, width, height) → complete 8-bit truecolor PNG file bytes
    * (zlib-deflated, multi-IDAT, all five scanline filters). */
  case class PngSynth(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "png_synth"

    override def nullSafeEval(id: Any, w: Any, h: Any): Any =
      MediaKernels.pngSynth(id.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, w, h) =>
        s"graft.multimodal.MediaKernels.pngSynth($i, $w, $h)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** PNG bytes → [width, height, bit_depth, color_type, sum_r, sum_g,
    * sum_b]; all(-1) when not a well-formed 8-bit RGB PNG. */
  case class PngParse(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "png_parse"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.pngParse(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.pngParse($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** (id, width, height) → complete GIF89a file bytes (256-entry global
    * palette, extension blocks, variable-width LZW image data). */
  case class GifSynth(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "gif_synth"

    override def nullSafeEval(id: Any, w: Any, h: Any): Any =
      MediaKernels.gifSynth(id.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, w, h) =>
        s"graft.multimodal.MediaKernels.gifSynth($i, $w, $h)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** (id, width, height) → complete INTERLACED GIF89a file bytes (the
    * same pixel formulas as [[GifSynth]], rows in 4-pass order). */
  case class GifSynthI(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "gif_synth_i"

    override def nullSafeEval(id: Any, w: Any, h: Any): Any =
      MediaKernels.gifSynthI(id.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, w, h) =>
        s"graft.multimodal.MediaKernels.gifSynthI($i, $w, $h)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** (id, width, height) → complete Adam7-INTERLACED PNG file bytes
    * (the same pixel formulas as [[PngSynth]], seven filtered passes). */
  case class PngSynthI(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "png_synth_i"

    override def nullSafeEval(id: Any, w: Any, h: Any): Any =
      MediaKernels.pngSynthI(id.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, w, h) =>
        s"graft.multimodal.MediaKernels.pngSynthI($i, $w, $h)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** GIF bytes → [width, height, gct_size, min_code_size, sum_r, sum_g,
    * sum_b, sum_r_even, sum_r_odd] (the parity pair makes 4-pass
    * de-interlacing observable); all(-1) when not a well-formed
    * single-frame GIF. */
  case class GifParse(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "gif_parse"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.gifParse(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.gifParse($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** (id, width, height) → complete baseline JPEG file bytes (block-
    * constant YCbCr planes — the exact-round-trip contract — with a
    * restart interval, spec example Huffman tables via DHT). */
  case class JpegSynth(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "jpeg_synth"

    override def nullSafeEval(id: Any, w: Any, h: Any): Any =
      MediaKernels.jpegSynth(id.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, w, h) =>
        s"graft.multimodal.MediaKernels.jpegSynth($i, $w, $h)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** (id, width, height) → complete PROGRESSIVE (SOF2) JPEG file bytes:
    * the same block-constant planes as [[JpegSynth]] through the
    * multi-scan encoder (spectral selection + successive approximation,
    * file-defined Huffman tables, restart intervals in every scan). */
  case class JpegSynthProg(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "jpeg_synth_prog"

    override def nullSafeEval(id: Any, w: Any, h: Any): Any =
      MediaKernels.jpegSynthProg(id.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (i, w, h) =>
        s"graft.multimodal.MediaKernels.jpegSynthProg($i, $w, $h)")

    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  /** JPEG bytes → [width, height, n_components, restart_interval, sum_y,
    * sum_cb, sum_cr]; all(-1) when not a well-formed baseline 4:4:4 or
    * grayscale JPEG. */
  case class JpegParse(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "jpeg_parse"

    override def nullSafeEval(bytes: Any): Any =
      MediaKernels.jpegParse(bytes.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, b => s"graft.multimodal.MediaKernels.jpegParse($b)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def bmpSynth(id: Column, width: Column, height: Column): Column =
    column(BmpSynth(expression(id), expression(width), expression(height)))
  def bmpParse(payload: Column): Column = column(BmpParse(expression(payload)))
  def bmpDhash(payload: Column): Column = column(BmpDhash(expression(payload)))
  def pngSynth(id: Column, width: Column, height: Column): Column =
    column(PngSynth(expression(id), expression(width), expression(height)))
  def pngParse(payload: Column): Column = column(PngParse(expression(payload)))
  def gifSynth(id: Column, width: Column, height: Column): Column =
    column(GifSynth(expression(id), expression(width), expression(height)))
  def gifSynthI(id: Column, width: Column, height: Column): Column =
    column(GifSynthI(expression(id), expression(width), expression(height)))
  def pngSynthI(id: Column, width: Column, height: Column): Column =
    column(PngSynthI(expression(id), expression(width), expression(height)))
  def gifParse(payload: Column): Column = column(GifParse(expression(payload)))
  def jpegSynth(id: Column, width: Column, height: Column): Column =
    column(JpegSynth(expression(id), expression(width), expression(height)))
  def jpegSynthProg(id: Column, width: Column, height: Column): Column =
    column(JpegSynthProg(expression(id), expression(width), expression(height)))
  def jpegParse(payload: Column): Column = column(JpegParse(expression(payload)))
  def bmpPerturb(payload: Column): Column = column(BmpPerturb(expression(payload)))
  def wavSynth(id: Column, channels: Column, sampleRate: Column, frames: Column): Column =
    column(WavSynth(expression(id), expression(channels),
      expression(sampleRate), expression(frames)))
  def wavParse(payload: Column): Column = column(WavParse(expression(payload)))
  def wavEfp(payload: Column): Column = column(WavEfp(expression(payload)))
  def wavPerturb(payload: Column): Column = column(WavPerturb(expression(payload)))
  def vidSynth(id: Column, width: Column, height: Column,
               frames: Column, fpsMilli: Column): Column =
    column(VidSynth(expression(id), expression(width), expression(height),
      expression(frames), expression(fpsMilli)))
  def vidParse(payload: Column): Column = column(VidParse(expression(payload)))
  def vidDhash(payload: Column): Column = column(VidDhash(expression(payload)))
  def vidPerturb(payload: Column): Column = column(VidPerturb(expression(payload)))
}
