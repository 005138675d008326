package org.terifan.ocr;

// Golden-output oracle for the PySpark reimplementation (test-time only; never at runtime).
//
// Compiles against the read-only reference at /root/reference and dumps, as JSON + gray
// PNGs, every intermediate the NumPy kernel must reproduce bit-exactly:
//   - Java2D's grayscale conversion of each bundled asset (Bitmap.java:26-42)
//   - learned alphabet features per glyph (CurvatureClassifier.java:45-79,804-846)
//   - resize calibration: pre-threshold 9x9 gray values (ImageTools.java:11-68)
//   - full page scans: word/char boxes + recognized strings (OCREngine.java:54-133)
//
// Usage:
//   java org.terifan.ocr.GoldenDump gray      <in.png> <out.png>
//   java org.terifan.ocr.GoldenDump alphabet  <font.png> <fontName> <out.json>
//   java org.terifan.ocr.GoldenDump scan      <in.png> <spacingPx> <out.json>

import java.awt.Insets;
import java.awt.Polygon;
import java.awt.image.BufferedImage;
import java.awt.image.DataBufferByte;
import java.awt.RenderingHints;
import java.io.File;
import java.io.PrintWriter;
import java.util.ArrayList;
import javax.imageio.ImageIO;

public class GoldenDump
{
	static final int MS = OCREngine.DEFAULT_MATRIX_SIZE; // 9

	public static void main(String[] args) throws Exception
	{
		switch (args[0])
		{
			case "gray": dumpGray(args[1], args[2]); break;
			case "alphabet": dumpAlphabet(args[1], args[2], args[3]); break;
			case "scan": dumpScan(args[1], Double.parseDouble(args[2]), Integer.parseInt(args[3]), args[4]); break;
			case "lut": dumpLut(args[1]); break;
			case "lutgetrgb": dumpLutGetRGB(args[1]); break;
			case "resize": dumpResizeProbes(args[1]); break;
			case "resize2": dumpResize2(Integer.parseInt(args[1]), Integer.parseInt(args[2]), Integer.parseInt(args[3]), Integer.parseInt(args[4]), args[5]); break;
			case "blit1": blit1(Integer.parseInt(args[1]), Integer.parseInt(args[2]), Integer.parseInt(args[3]), Integer.parseInt(args[4]), args[5], args[6]); break;
			case "rotshear": rotShear(args[1], Double.parseDouble(args[2]), args[3]); break;
			case "rotfixed": rotFixed(args[1], Integer.parseInt(args[2]), args[3]); break;
			case "erase": erase(args[1], Double.parseDouble(args[2]), Integer.parseInt(args[3]), args[4]); break;
			case "words": words(args[1], args[2]); break;
			case "sobel": sobel(args[1], args[2]); break;
			case "angle": angle(args[1], Integer.parseInt(args[2]), Integer.parseInt(args[3])); break;
			case "rgb2gray": rgb2gray(args[1]); break;
			case "sheardbg": shearDbg(args[1], Double.parseDouble(args[2]), args[3]); break;
			case "benchscan": benchScan(args[1], Integer.parseInt(args[2])); break;
			case "rotspline": rotSpline(args[1], Double.parseDouble(args[2]), Integer.parseInt(args[3]), args[4]); break;
			case "debugbmp": dumpDebugBitmaps(args[1], args[2], args[3], args.length > 4 ? Integer.parseInt(args[4]) : MS); break;
			case "debugscan": dumpDebugScan(args[1], Double.parseDouble(args[2]), Integer.parseInt(args[3]), args[4]); break;
			case "aaprobe": dumpAaProbe(args[1]); break;
			default: throw new IllegalArgumentException(args[0]);
		}
	}

	// F8 debug curvature renders: learn() attaches one per glyph
	// (CurvatureClassifier.java:74-76 -> generateCurvatureBitmap :498-735).
	static void dumpDebugBitmaps(String fontPng, String fontName, String outDir, int ms) throws Exception
	{
		Bitmap sheet = load(fontPng);
		OCREngine engine = new OCREngine(ms);
		engine.learnAlphabet(fontName, sheet);
		ArrayList<Symbol> symbols = engine.getTemplates();
		for (int si = 0; si < symbols.size(); si++)
		{
			Symbol s = symbols.get(si);
			BufferedImage b = s.getSymbolBitmap();
			if (b == null) continue;
			TextBox box = s.mTextBox;
			ImageIO.write(b, "png", new File(outDir + "/debugbmp_" + si + "_" + box.x + "_" + box.y + ".png"));
		}
	}

	// F8 via the classify path: scan a page (same pad/spacing protocol as
	// dumpScan) and dump the debug sheet classifySymbol attaches to each
	// char TextBox (CurvatureClassifier.java:850-861). Filenames carry the
	// char box (x_y_w_h) on the padded canonical raster.
	static void dumpDebugScan(String pagePng, double spacingPx, int pad, String outDir) throws Exception
	{
		Bitmap sheet = load("/root/reference/src/org/terifan/ocr/fonts/arial.png");
		BufferedImage src = ImageIO.read(new File(pagePng));
		if (pad > 0)
		{
			BufferedImage padded = new BufferedImage(src.getWidth() + 2 * pad, src.getHeight() + 2 * pad, BufferedImage.TYPE_BYTE_GRAY);
			java.awt.Graphics2D g = padded.createGraphics();
			g.setColor(java.awt.Color.WHITE);
			g.fillRect(0, 0, padded.getWidth(), padded.getHeight());
			g.drawImage(src, pad, pad, null);
			g.dispose();
			src = padded;
		}
		Page page = new Page(new Bitmap(src));
		OCREngine engine = new OCREngine(MS);
		engine.learnAlphabet("arial", sheet);
		Settings settings = new Settings();
		settings.setMaxCharacterSpacing(spacingPx);
		engine.loadPage(page, settings);
		engine.scan(0, 0, 1, 1, new SimpleResolver());
		for (TextBox word : engine.getScanResult())
			for (TextBox cb : word.getChildren())
			{
				BufferedImage b = cb.getSymbolBitmap();
				if (b == null) continue;
				ImageIO.write(b, "png", new File(outDir + "/debugscan_" + cb.x + "_" + cb.y + "_" + cb.width + "_" + cb.height + ".png"));
			}
	}

	// Java2D SrcOver/stroke calibration probe for the F8 reimplementation:
	// alpha fills over known backgrounds, plus crisp (normalized) 1px/3px
	// axis-aligned AA lines and one diagonal + triangle as the AA reference.
	static void dumpAaProbe(String out) throws Exception
	{
		BufferedImage img = new BufferedImage(120, 120, BufferedImage.TYPE_INT_RGB);
		java.awt.Graphics2D g = img.createGraphics();
		g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON);
		int[] bgs = {0x000000, 0x404040, 0x808080, 0xC0C0C0, 0xFFFFFF, 0x1E3C64};
		for (int i = 0; i < 6; i++) { g.setColor(new java.awt.Color(bgs[i])); g.fillRect(0, i * 10, 120, 10); }
		java.awt.Color[] strips = {
			new java.awt.Color(255, 255, 255, 240), new java.awt.Color(255, 255, 255, 64),
			new java.awt.Color(0, 0, 0, 16), new java.awt.Color(255, 0, 0, 128),
			new java.awt.Color(0, 255, 255, 128) };
		for (int i = 0; i < strips.length; i++) { g.setColor(strips[i]); g.fillRect(10 + i * 15, 0, 10, 60); }
		g.setColor(java.awt.Color.WHITE);
		g.fillRect(0, 60, 120, 60);
		g.setColor(java.awt.Color.BLACK);
		g.drawLine(10, 70, 40, 70);
		g.drawLine(50, 65, 50, 95);
		g.setStroke(new java.awt.BasicStroke(3));
		g.drawLine(10, 80, 40, 80);
		g.setStroke(new java.awt.BasicStroke(1));
		g.drawLine(60, 65, 90, 95);
		g.fillPolygon(new int[]{100, 115, 100}, new int[]{65, 95, 95}, 3);
		g.dispose();
		ImageIO.write(img, "png", new File(out));
	}

	static Bitmap load(String path) throws Exception
	{
		return new Bitmap(ImageIO.read(new File(path)));
	}

	static void dumpGray(String in, String out) throws Exception
	{
		Bitmap bmp = load(in);
		ImageIO.write(bmp.getImage(), "png", new File(out));
	}

	static String intArr(int[] a)
	{
		StringBuilder sb = new StringBuilder("[");
		for (int i = 0; i < a.length; i++) { if (i > 0) sb.append(","); sb.append(a[i]); }
		return sb.append("]").toString();
	}

	static String dblArr(double[] a)
	{
		StringBuilder sb = new StringBuilder("[");
		for (int i = 0; i < a.length; i++)
		{
			if (i > 0) sb.append(",");
			double v = a[i];
			if (Double.isNaN(v)) sb.append("null"); else sb.append(v);
		}
		return sb.append("]").toString();
	}

	static String esc(String s)
	{
		StringBuilder sb = new StringBuilder();
		for (char c : s.toCharArray())
		{
			if (c == '"' || c == '\\') sb.append('\\');
			sb.append(c);
		}
		return sb.toString();
	}

	// raster of a Bitmap as 0/1 black mask, row-major
	static String mask(Bitmap b)
	{
		int[] m = new int[b.getWidth() * b.getHeight()];
		for (int y = 0, i = 0; y < b.getHeight(); y++)
			for (int x = 0; x < b.getWidth(); x++, i++)
				m[i] = b.isBlack(x, y) ? 1 : 0;
		return intArr(m);
	}

	// Replicates CurvatureClassifier.extractBitmap's crop+resize (pre-threshold),
	// returning the 9x9 averaged gray values - the resize-parity calibration target.
	static int[] resizedGray(Bitmap page, int bx, int by, int bw, int bh, int[] cropDims)
	{
		Insets b = page.getBorders(bx, by, bw, bh);
		BufferedImage crop = page.getRegion(bx + b.left, by + b.top, bx + bw - b.right + 1, by + bh - b.bottom + 1);
		cropDims[0] = crop.getWidth();
		cropDims[1] = crop.getHeight();
		cropDims[2] = b.top; cropDims[3] = b.left; cropDims[4] = b.bottom; cropDims[5] = b.right;
		BufferedImage rs = ImageTools.resize(crop, MS, MS, RenderingHints.VALUE_INTERPOLATION_BILINEAR, BufferedImage.TYPE_INT_RGB);
		int[] g = new int[MS * MS];
		for (int y = 0, i = 0; y < MS; y++)
			for (int x = 0; x < MS; x++, i++)
			{
				int c = rs.getRGB(x, y);
				g[i] = ((255 & (c >> 16)) + (255 & (c >> 8)) + (255 & c)) / 3;
			}
		return g;
	}

	static void dumpAlphabet(String fontPng, String fontName, String out) throws Exception
	{
		Bitmap sheet = load(fontPng);
		OCREngine engine = new OCREngine(MS);
		engine.learnAlphabet(fontName, sheet);
		ArrayList<Symbol> symbols = engine.getTemplates();

		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.println("{\"font\":\"" + esc(fontName) + "\",\"matrix_size\":" + MS + ",\"symbols\":[");
		for (int si = 0; si < symbols.size(); si++)
		{
			Symbol s = symbols.get(si);
			TextBox box = s.mTextBox;
			int[] cd = new int[6];
			int[] gray = resizedGray(sheet, box.x, box.y, box.width, box.height, cd);

			w.print("{\"char\":\"" + esc(s.mCharacter) + "\",\"def_char\":\"" + esc(s.mDefCharacter) + "\"");
			w.print(",\"box\":[" + box.x + "," + box.y + "," + box.width + "," + box.height + "]");
			w.print(",\"borders\":[" + cd[2] + "," + cd[3] + "," + cd[4] + "," + cd[5] + "]"); // t,l,b,r
			w.print(",\"crop_w\":" + cd[0] + ",\"crop_h\":" + cd[1]);
			w.print(",\"gray\":" + intArr(gray));
			w.print(",\"matrix\":" + mask(s.getBitmap()));
			w.print(",\"contour\":[");
			for (int o = 0; o < 8; o++) { if (o > 0) w.print(","); w.print(dblArr(s.mContour[o])); }
			w.print("],\"slopes\":[");
			for (int o = 0; o < 8; o++) { if (o > 0) w.print(","); w.print(intArr(s.mSlopes[o])); }
			w.print("],\"slopes2\":[");
			for (int o = 0; o < 8; o++) { if (o > 0) w.print(","); w.print(intArr(s.mSlopes2[o])); }
			w.print("],\"curvature_slopes\":[");
			for (int o = 0; o < 8; o++) { if (o > 0) w.print(","); w.print(intArr(s.mCurvatureSlopes[o])); }
			w.print("],\"polygons\":[");
			for (int o = 0; o < 8; o++)
			{
				if (o > 0) w.print(",");
				w.print("[");
				for (int i = 0; i < s.mCurvature[o].length; i++)
				{
					Polygon p = s.mCurvature[o][i];
					if (i > 0) w.print(",");
					w.print("[" + intArr(p.xpoints.length > 3 ? java.util.Arrays.copyOf(p.xpoints, 3) : p.xpoints)
						+ "," + intArr(p.ypoints.length > 3 ? java.util.Arrays.copyOf(p.ypoints, 3) : p.ypoints) + "]");
				}
				w.print("]");
			}
			w.print("],\"curvature_vector\":[");
			for (int o = 0; o < 8; o++)
			{
				if (o > 0) w.print(",");
				w.print("[");
				for (int t = 0; t < 2; t++) { if (t > 0) w.print(","); w.print(dblArr(s.mCurvatureVector[o][t])); }
				w.print("]");
			}
			w.print("],\"closest_pixel\":[");
			for (int y = 0; y < MS; y++) { if (y > 0) w.print(","); w.print(intArr(s.mClosestPixel[y])); }
			w.print("]}");
			w.println(si < symbols.size() - 1 ? "," : "");
		}
		w.println("]}");
		w.close();
	}

	// gray->sRGB conversion table used when TYPE_BYTE_GRAY is drawn into TYPE_INT_RGB
	static void dumpLut(String out) throws Exception
	{
		BufferedImage g8 = new BufferedImage(256, 1, BufferedImage.TYPE_BYTE_GRAY);
		byte[] raster = ((DataBufferByte)g8.getRaster().getDataBuffer()).getData();
		for (int i = 0; i < 256; i++) raster[i] = (byte)i;
		BufferedImage rgb = new BufferedImage(256, 1, BufferedImage.TYPE_INT_RGB);
		java.awt.Graphics2D g = rgb.createGraphics();
		g.drawImage(g8, 0, 0, null);
		g.dispose();
		int[] lut = new int[256];
		int[] lutG = new int[256];
		int[] lutB = new int[256];
		for (int i = 0; i < 256; i++)
		{
			int c = rgb.getRGB(i, 0);
			lut[i] = 255 & (c >> 16); lutG[i] = 255 & (c >> 8); lutB[i] = 255 & c;
		}
		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.println("{\"r\":" + intArr(lut) + ",\"g\":" + intArr(lutG) + ",\"b\":" + intArr(lutB) + "}");
		w.close();
	}

	// gray->sRGB curve applied by BufferedImage.getRGB on TYPE_BYTE_GRAY
	// (hit when the crop is already exactly matrix-sized and resize() is a no-op)
	static void dumpLutGetRGB(String out) throws Exception
	{
		BufferedImage g8 = new BufferedImage(256, 1, BufferedImage.TYPE_BYTE_GRAY);
		byte[] raster = ((DataBufferByte)g8.getRaster().getDataBuffer()).getData();
		for (int i = 0; i < 256; i++) raster[i] = (byte)i;
		int[] lut = new int[256];
		for (int i = 0; i < 256; i++) lut[i] = 255 & (g8.getRGB(i, 0) >> 16);
		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.println("{\"r\":" + intArr(lut) + "}");
		w.close();
	}

	// deterministic pseudo-random gray patterns resized to 9x9: calibration pairs
	static void dumpResizeProbes(String out) throws Exception
	{
		int[][] sizes = {
			{1,1},{2,2},{3,3},{4,4},{5,5},{6,6},{7,7},{8,8},{9,9},{10,10},{11,11},
			{12,12},{13,13},{15,15},{17,17},{18,18},{19,22},{14,21},{16,23},{3,22},
			{5,50},{50,5},{36,36},{37,41},{47,53},{67,49},{69,67},{70,68},{100,75},
			{2,9},{9,2},{8,23},{23,8},{33,9},{9,33},{27,31},{63,64},{96,96}
		};
		long seed = 0x5DEECE66DL;
		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.println("{\"probes\":[");
		for (int si = 0; si < sizes.length; si++)
		{
			int pw = sizes[si][0], ph = sizes[si][1];
			BufferedImage g8 = new BufferedImage(pw, ph, BufferedImage.TYPE_BYTE_GRAY);
			byte[] raster = ((DataBufferByte)g8.getRaster().getDataBuffer()).getData();
			int[] in = new int[pw * ph];
			for (int i = 0; i < raster.length; i++)
			{
				// LCG identical to the python side
				seed = (seed * 6364136223846793005L + 1442695040888963407L);
				int v = (int)((seed >>> 33) & 255);
				raster[i] = (byte)v;
				in[i] = v;
			}
			BufferedImage rs = ImageTools.resize(g8, MS, MS, RenderingHints.VALUE_INTERPOLATION_BILINEAR, BufferedImage.TYPE_INT_RGB);
			int[] outPix = new int[MS * MS];
			int[] outR = new int[MS * MS];
			for (int y = 0, i = 0; y < MS; y++)
				for (int x = 0; x < MS; x++, i++)
				{
					int c = rs.getRGB(x, y);
					outPix[i] = ((255 & (c >> 16)) + (255 & (c >> 8)) + (255 & c)) / 3;
					outR[i] = 255 & (c >> 16);
				}
			w.print("{\"w\":" + pw + ",\"h\":" + ph + ",\"in\":" + intArr(in) + ",\"out\":" + intArr(outPix) + ",\"out_r\":" + intArr(outR) + "}");
			w.println(si < sizes.length - 1 ? "," : "");
		}
		w.println("]}");
		w.close();
	}

	// single drawImage scale step (as in ImageTools.resizeDown), src gray or rgb
	static void blit1(int pw, int ph, int tw, int th, String srcType, String csv) throws Exception
	{
		String[] parts = csv.split(",");
		BufferedImage src;
		if (srcType.equals("gray"))
		{
			src = new BufferedImage(pw, ph, BufferedImage.TYPE_BYTE_GRAY);
			byte[] raster = ((DataBufferByte)src.getRaster().getDataBuffer()).getData();
			for (int i = 0; i < raster.length; i++) raster[i] = (byte)Integer.parseInt(parts[i % parts.length].trim());
		}
		else
		{
			src = new BufferedImage(pw, ph, BufferedImage.TYPE_INT_RGB);
			for (int y = 0, i = 0; y < ph; y++)
				for (int x = 0; x < pw; x++, i++)
				{
					int v = Integer.parseInt(parts[i % parts.length].trim());
					src.setRGB(x, y, (v << 16) | (v << 8) | v);
				}
		}
		BufferedImage dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB);
		java.awt.Graphics2D g = dst.createGraphics();
		g.setRenderingHint(RenderingHints.KEY_INTERPOLATION, RenderingHints.VALUE_INTERPOLATION_BILINEAR);
		g.setRenderingHint(RenderingHints.KEY_RENDERING, RenderingHints.VALUE_RENDER_QUALITY);
		g.drawImage(src, 0, 0, tw, th, null);
		g.dispose();
		StringBuilder sb = new StringBuilder();
		for (int y = 0; y < th; y++)
			for (int x = 0; x < tw; x++)
			{
				if (sb.length() > 0) sb.append(",");
				sb.append(255 & (dst.getRGB(x, y) >> 16));
			}
		System.out.println(sb);
	}

	// one-off resize of a csv pattern (stdin) to (tw,th); prints output csv to stdout
	static void dumpResize2(int pw, int ph, int tw, int th, String csv) throws Exception
	{
		String[] parts = csv.split(",");
		BufferedImage g8 = new BufferedImage(pw, ph, BufferedImage.TYPE_BYTE_GRAY);
		byte[] raster = ((DataBufferByte)g8.getRaster().getDataBuffer()).getData();
		for (int i = 0; i < raster.length; i++) raster[i] = (byte)Integer.parseInt(parts[i % parts.length].trim());
		BufferedImage rs = ImageTools.resize(g8, tw, th, RenderingHints.VALUE_INTERPOLATION_BILINEAR, BufferedImage.TYPE_INT_RGB);
		StringBuilder sb = new StringBuilder();
		for (int y = 0; y < rs.getHeight(); y++)
		{
			for (int x = 0; x < rs.getWidth(); x++)
			{
				if (sb.length() > 0) sb.append(",");
				sb.append(255 & (rs.getRGB(x, y) >> 16));
			}
		}
		System.out.println(sb);
	}

	static void dumpScan(String pagePng, double spacingPx, int pad, String out) throws Exception
	{
		Bitmap sheet = load("/root/reference/src/org/terifan/ocr/fonts/arial.png");
		BufferedImage src = ImageIO.read(new File(pagePng));
		if (pad > 0)
		{
			// paste onto a white canvas so glyphs never touch the page edge (the reference
			// indexes the raster unclamped during box growth, PageSegmenter.java:202-236)
			BufferedImage padded = new BufferedImage(src.getWidth() + 2 * pad, src.getHeight() + 2 * pad, BufferedImage.TYPE_BYTE_GRAY);
			java.awt.Graphics2D g = padded.createGraphics();
			g.setColor(java.awt.Color.WHITE);
			g.fillRect(0, 0, padded.getWidth(), padded.getHeight());
			g.drawImage(src, pad, pad, null);
			g.dispose();
			src = padded;
		}
		Bitmap bmp = new Bitmap(src);
		Page page = new Page(bmp);
		// canonical input raster for the Python side (post gray-conversion, post padding)
		ImageIO.write(bmp.getImage(), "png", new File(out.replace(".json", ".gray.png")));

		OCREngine engine = new OCREngine(MS);
		engine.learnAlphabet("arial", sheet);

		Settings settings = new Settings();
		settings.setMaxCharacterSpacing(spacingPx);

		engine.loadPage(page, settings);
		engine.scan(0, 0, 1, 1, new SimpleResolver());

		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.println("{\"page\":\"" + esc(new File(pagePng).getName()) + "\",\"spacing_px\":" + spacingPx
			+ ",\"width\":" + bmp.getWidth() + ",\"height\":" + bmp.getHeight() + ",\"words\":[");
		ArrayList<TextBox> words = engine.getScanResult();
		for (int wi = 0; wi < words.size(); wi++)
		{
			TextBox word = words.get(wi);
			w.print("{\"box\":[" + word.x + "," + word.y + "," + word.width + "," + word.height + "]");
			w.print(",\"text\":\"" + esc(word.toString()) + "\"");
			w.print(",\"chars\":[");
			ArrayList<TextBox> chars = word.getChildren();
			for (int ci = 0; ci < chars.size(); ci++)
			{
				TextBox cb = chars.get(ci);
				int[] cd = new int[6];
				int[] gray = resizedGray(bmp, cb.x, cb.y, cb.width, cb.height, cd);
				String ch = cb.getResults().isEmpty() ? "" : cb.getResults().get(0).getSymbol().getCharacter();
				if (ci > 0) w.print(",");
				w.print("{\"box\":[" + cb.x + "," + cb.y + "," + cb.width + "," + cb.height + "]");
				w.print(",\"index\":" + cb.getIndex());
				w.print(",\"char\":\"" + esc(ch) + "\"");
				w.print(",\"borders\":[" + cd[2] + "," + cd[3] + "," + cd[4] + "," + cd[5] + "]");
				w.print(",\"crop_w\":" + cd[0] + ",\"crop_h\":" + cd[1]);
				w.print(",\"gray\":" + intArr(gray) + "}");
			}
			w.print("]}");
			w.println(wi < words.size() - 1 ? "," : "");
		}
		w.println("]}");
		w.close();
	}

	// P9: quality-1 three-shear rotation exactly as Bitmap.rotate would invoke it
	// (ImageRotator.java:122-168 driver; bg 0xFFFFFFFF per Bitmap.java:105).
	// Result is INT_RGB; canonicalized to gray through the Bitmap constructor.
	static void rotShear(String in, double angleDeg, String out) throws Exception
	{
		Bitmap bmp = load(in);
		BufferedImage rotated = ImageRotator.rotate(bmp.getImage(), angleDeg, 1, 0xFFFFFFFF);
		ImageIO.write(new Bitmap(rotated).getImage(), "png", new File(out));
	}

	// P8: quadrant rotation via ImageRotator.rotate(90|180|270) (rotateFast path).
	static void rotFixed(String in, int angleDeg, String out) throws Exception
	{
		Bitmap bmp = load(in);
		BufferedImage rotated = ImageRotator.rotate(bmp.getImage(), angleDeg, 1, 0xFFFFFFFF);
		ImageIO.write(new Bitmap(rotated).getImage(), "png", new File(out));
	}

	// P11: ruling-line erasure in place on the gray raster (Bitmap.java:433-497).
	static void erase(String in, double minInches, int extra, String out) throws Exception
	{
		Bitmap bmp = load(in);
		bmp.eraseLines(minInches, extra);
		ImageIO.write(bmp.getImage(), "png", new File(out));
	}

	// P6: skew estimate (Bitmap.findAngle, private -> reflection).
	static void angle(String in, int fromY, int toY) throws Exception
	{
		Bitmap bmp = load(in);
		java.lang.reflect.Method m = Bitmap.class.getDeclaredMethod("findAngle", int.class, int.class);
		m.setAccessible(true);
		System.out.println(m.invoke(bmp, fromY, toY));
	}

	// L2: bounded fuzzy word match. Input TSV: template \t compare \t maxErrors \t caseSensitive
	static void words(String inTsv, String out) throws Exception
	{
		java.util.List<String> lines = java.nio.file.Files.readAllLines(new File(inTsv).toPath());
		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.println("[");
		for (int i = 0; i < lines.size(); i++)
		{
			String[] p = lines.get(i).split("\t");
			boolean ok = SimpleResolver.compareWords(p[0], p[1], Integer.parseInt(p[2]), Boolean.parseBoolean(p[3]));
			w.println("{\"template\":\"" + esc(p[0]) + "\",\"compare\":\"" + esc(p[1])
				+ "\",\"max_errors\":" + p[2] + ",\"case_sensitive\":" + p[3]
				+ ",\"accept\":" + ok + "}" + (i < lines.size() - 1 ? "," : ""));
		}
		w.println("]");
		w.close();
	}

	// Calibration probe: INT_RGB -> TYPE_BYTE_GRAY drawImage conversion (the
	// Bitmap constructor path) over a 17-step RGB lattice + all equal-channel
	// values, so the NumPy port can verify its formula on mixed channels too
	// (three-shear leftover arithmetic can make channels diverge).
	static void rgb2gray(String out) throws Exception
	{
		java.util.ArrayList<int[]> probes = new java.util.ArrayList<>();
		for (int r = 0; r < 256; r += 17)
			for (int g = 0; g < 256; g += 17)
				for (int b = 0; b < 256; b += 17)
					probes.add(new int[]{r, g, b});
		for (int v = 0; v < 256; v++)
			probes.add(new int[]{v, v, v});
		BufferedImage src = new BufferedImage(probes.size(), 1, BufferedImage.TYPE_INT_RGB);
		for (int i = 0; i < probes.size(); i++)
		{
			int[] p = probes.get(i);
			src.setRGB(i, 0, (p[0] << 16) | (p[1] << 8) | p[2]);
		}
		byte[] gray = ((DataBufferByte)new Bitmap(src).getImage().getRaster().getDataBuffer()).getData();
		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.print("[");
		for (int i = 0; i < probes.size(); i++)
		{
			int[] p = probes.get(i);
			w.print("[" + p[0] + "," + p[1] + "," + p[2] + "," + (255 & gray[i]) + "]");
			if (i < probes.size() - 1) w.print(",");
		}
		w.println("]");
		w.close();
	}

	// Debug: replicate the rotate45 driver (ImageRotator.java:275-370) via
	// reflection and dump each stage's packed int buffer for stage-level
	// comparison with the NumPy port. Not part of the committed goldens.
	static void shearDbg(String in, double dAngle, String outDir) throws Exception
	{
		Bitmap bmp = load(in);
		ImageRotatorBuffer src = new ImageRotatorBuffer(bmp.getImage());
		int bg = 0xFFFFFFFF;

		java.lang.reflect.Method hskew = ImageRotatorBuffer.class.getDeclaredMethod("horizontalSkew",
			ImageRotatorBuffer.class, ImageRotatorBuffer.class, int.class, int.class, int.class, int.class);
		java.lang.reflect.Method vskew = ImageRotatorBuffer.class.getDeclaredMethod("verticalSkew",
			ImageRotatorBuffer.class, ImageRotatorBuffer.class, int.class, int.class, int.class, int.class);
		hskew.setAccessible(true);
		vskew.setAccessible(true);

		double dRadAngle = Math.toRadians(dAngle);
		double dSinE = Math.sin(dRadAngle);
		double dTan = Math.tan(dRadAngle / 2);
		int srcWidth = src.getWidth(), srcHeight = src.getHeight();

		int width_1 = srcWidth + (int)((double)srcHeight * Math.abs(dTan) + 0.5);
		int height_1 = srcHeight;
		ImageRotatorBuffer dst1 = new ImageRotatorBuffer(width_1, height_1);
		for (int u = 0; u < height_1; u++)
		{
			double dShear = (dTan >= 0) ? ((double)u + 0.5) * dTan : ((double)((int)u - height_1) + 0.5) * dTan;
			int iShear = (int)dShear;
			hskew.invoke(null, src, dst1, u, iShear, (int)(255 * (dShear - (double)iShear) + 1), bg);
		}
		dumpBuf(dst1, outDir + "/stage1.txt");

		int width_2 = width_1;
		int height_2 = (int)((double)srcWidth * Math.abs(dSinE) + (double)srcHeight * Math.cos(dRadAngle) + 0.5) + 1;
		ImageRotatorBuffer dst2 = new ImageRotatorBuffer(width_2, height_2);
		double dOffset = (dSinE > 0) ? ((double)srcWidth - 1) * dSinE : -dSinE * (double)(srcWidth - width_2);
		for (int u = 0; u < width_2; u++, dOffset -= dSinE)
		{
			int iShear = (int)dOffset;
			vskew.invoke(null, dst1, dst2, u, iShear, (int)(255 * (dOffset - (double)iShear) + 1), bg);
		}
		dumpBuf(dst2, outDir + "/stage2.txt");

		int width_3 = (int)((double)srcHeight * Math.abs(dSinE) + (double)srcWidth * Math.cos(dRadAngle) + 0.5) + 1;
		int height_3 = height_2;
		ImageRotatorBuffer dst3 = new ImageRotatorBuffer(width_3, height_3);
		dOffset = (dSinE >= 0) ? (double)(srcWidth - 1) * dSinE * -dTan
			: dTan * ((double)(srcWidth - 1) * -dSinE + (double)(1 - height_3));
		for (int u = 0; u < height_3; u++, dOffset += dTan)
		{
			int iShear = (int)dOffset;
			hskew.invoke(null, dst2, dst3, u, iShear, (int)(255 * (dOffset - (double)iShear) + 1), bg);
		}
		dumpBuf(dst3, outDir + "/stage3.txt");
	}

	static void dumpBuf(ImageRotatorBuffer buf, String out) throws Exception
	{
		PrintWriter w = new PrintWriter(out, "UTF-8");
		w.println(buf.getWidth() + " " + buf.getHeight());
		int[] b = buf.getBuffer();
		for (int i = 0; i < b.length; i++) w.println(b[i]);
		w.close();
	}

	// P10: quality 2-5 B-spline rotation (ImageRotator quality branch).
	static void rotSpline(String in, double angleDeg, int quality, String out) throws Exception
	{
		Bitmap bmp = load(in);
		BufferedImage rotated = ImageRotator.rotate(bmp.getImage(), angleDeg, quality, 0xFFFFFFFF);
		ImageIO.write(new Bitmap(rotated).getImage(), "png", new File(out));
	}

	// Reference single-node throughput: learn once, then loadPage+scan every
	// PNG in a directory `reps` times (the same work our media-span kernel
	// performs per page). Prints pages/sec after a warmup round.
	static void benchScan(String dir, int reps) throws Exception
	{
		Bitmap sheet = load("/root/reference/src/org/terifan/ocr/fonts/arial.png");
		OCREngine engine = new OCREngine(MS);
		engine.learnAlphabet("arial", sheet);
		Settings settings = new Settings();
		settings.setMaxCharacterSpacing(8.0);

		File[] files = new File(dir).listFiles((d, n) -> n.endsWith(".png"));
		java.util.Arrays.sort(files);
		BufferedImage[] images = new BufferedImage[files.length];
		for (int i = 0; i < files.length; i++) images[i] = ImageIO.read(files[i]);

		// warmup (JIT)
		for (BufferedImage img : images)
		{
			engine.loadPage(new Page(new Bitmap(img)), settings);
			engine.scan(0, 0, 1, 1, new SimpleResolver());
		}
		long t0 = System.nanoTime();
		int n = 0;
		for (int r = 0; r < reps; r++)
		{
			for (BufferedImage img : images)
			{
				engine.loadPage(new Page(new Bitmap(img)), settings);
				engine.scan(0, 0, 1, 1, new SimpleResolver());
				n++;
			}
		}
		double sec = (System.nanoTime() - t0) / 1e9;
		System.out.println("pages=" + n + " sec=" + String.format("%.2f", sec)
			+ " pages_per_sec=" + String.format("%.1f", n / sec));
	}

	// F7: gen-2 Sobel filter (ocr2/ConvolutionalClassifier.filerImage, private -> reflection).
	static void sobel(String in, String out) throws Exception
	{
		BufferedImage gray = load(in).getImage();
		BufferedImage src = new BufferedImage(gray.getWidth(), gray.getHeight(), BufferedImage.TYPE_INT_RGB);
		java.awt.Graphics2D g = src.createGraphics();
		g.drawImage(gray, 0, 0, null);
		g.dispose();
		BufferedImage dst = new BufferedImage(src.getWidth(), src.getHeight(), BufferedImage.TYPE_INT_RGB);
		int[][] kernel = {{-1, 0, 1}, {-2, 0, 2}, {-1, 0, 1}};
		Class<?> cc = Class.forName("org.terifan.ocr2.ConvolutionalClassifier");
		java.lang.reflect.Method m = cc.getDeclaredMethod("filerImage", BufferedImage.class, BufferedImage.class, int[][].class);
		m.setAccessible(true);
		m.invoke(null, src, dst, (Object)kernel);
		ImageIO.write(new Bitmap(dst).getImage(), "png", new File(out));
	}
}
