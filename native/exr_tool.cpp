// exr_tool — tiny bridge to the *system* OpenEXR implementation, used by
// tests/test_exr.py to prove our pure-numpy EXR codec (utils/exr.py)
// interoperates with real OpenEXR (the reference renderer writes EXRs via
// IlmImf, see /root/reference/src/libcore/bitmap.cpp).
//
// Usage:
//   exr_tool write <out.exr> <W> <H> <compression:none|zip|zips>
//       writes an RGB FLOAT image with pixel (x,y):
//       R = x + y/1000, G = sin(x*y), B = -y  (deterministic pattern)
//   exr_tool read <in.exr> <out.raw>
//       reads RGB(A) float pixels and dumps them as little-endian f32
//       binary, scanline order, channel-interleaved RGB.
#include <OpenEXR/ImfRgbaFile.h>
#include <OpenEXR/ImfArray.h>
#include <OpenEXR/ImfChannelList.h>
#include <OpenEXR/ImfInputFile.h>
#include <OpenEXR/ImfOutputFile.h>
#include <OpenEXR/ImfFrameBuffer.h>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

using namespace Imf;
using namespace Imath;

static int do_write(const char* path, int W, int H, const std::string& comp) {
  Compression c = NO_COMPRESSION;
  if (comp == "zip") c = ZIP_COMPRESSION;
  else if (comp == "zips") c = ZIPS_COMPRESSION;
  Header hdr(W, H);
  hdr.compression() = c;
  hdr.channels().insert("R", Channel(FLOAT));
  hdr.channels().insert("G", Channel(FLOAT));
  hdr.channels().insert("B", Channel(FLOAT));
  std::vector<float> r(W * H), g(W * H), b(W * H);
  for (int y = 0; y < H; ++y)
    for (int x = 0; x < W; ++x) {
      r[y * W + x] = x + y / 1000.0f;
      g[y * W + x] = std::sin(float(x) * float(y));
      b[y * W + x] = -float(y);
    }
  OutputFile f(path, hdr);
  FrameBuffer fb;
  fb.insert("R", Slice(FLOAT, (char*)r.data(), sizeof(float), sizeof(float) * W));
  fb.insert("G", Slice(FLOAT, (char*)g.data(), sizeof(float), sizeof(float) * W));
  fb.insert("B", Slice(FLOAT, (char*)b.data(), sizeof(float), sizeof(float) * W));
  f.setFrameBuffer(fb);
  f.writePixels(H);
  return 0;
}

static int do_read(const char* path, const char* out) {
  InputFile f(path);
  Box2i dw = f.header().dataWindow();
  int W = dw.max.x - dw.min.x + 1, H = dw.max.y - dw.min.y + 1;
  std::vector<float> r(W * H), g(W * H), b(W * H);
  FrameBuffer fb;
  auto slice = [&](std::vector<float>& v) {
    return Slice(FLOAT, (char*)(v.data() - dw.min.x - (size_t)dw.min.y * W),
                 sizeof(float), sizeof(float) * W);
  };
  fb.insert("R", slice(r));
  fb.insert("G", slice(g));
  fb.insert("B", slice(b));
  f.setFrameBuffer(fb);
  f.readPixels(dw.min.y, dw.max.y);
  FILE* fo = fopen(out, "wb");
  if (!fo) return 1;
  for (int i = 0; i < W * H; ++i) {
    fwrite(&r[i], 4, 1, fo);
    fwrite(&g[i], 4, 1, fo);
    fwrite(&b[i], 4, 1, fo);
  }
  fclose(fo);
  printf("%d %d\n", W, H);
  return 0;
}

int main(int argc, char** argv) {
  if (argc >= 6 && !strcmp(argv[1], "write"))
    return do_write(argv[2], atoi(argv[3]), atoi(argv[4]), argv[5]);
  if (argc >= 4 && !strcmp(argv[1], "read"))
    return do_read(argv[2], argv[3]);
  fprintf(stderr, "usage: exr_tool write out.exr W H comp | read in.exr out.raw\n");
  return 2;
}
