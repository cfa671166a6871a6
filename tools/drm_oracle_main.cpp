/* DRM mode-B encode oracle: drives Dream's transmit pipeline
 * (CDRMTransmitter::Run() stages, DrmTransmitter.cpp.OFF:32-81,
 * minus the sound-card source and the FDK-AAC source encoder) and
 * writes the modulated complex signal + a manifest of the injected
 * MSC payloads.  Compiled by tools/drm_oracle.py against the
 * read-only reference Dream tree; nothing here decodes anything —
 * the repo's receiver must.
 */

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "Parameter.h"
#include "MLC/MLC.h"
#include "interleaver/SymbolInterleaver.h"
#include "OFDMcellmapping/OFDMCellMapping.h"
#include "OFDM.h"
#include "FAC/FAC.h"
#include "SDC/SDC.h"
#include "util/Modul.h"
#include "util/Buffer.h"
#include "util/CRC.h"

/* source modules mirroring DataIO.cpp's CGenerateFACData /
 * CGenerateSDCData (DataIO.cpp:415-484) without the sound stack */
class CGenFAC : public CTransmitterModul<_BINARY, _BINARY>
{
public:
    virtual ~CGenFAC() {}
protected:
    CFACTransmit FACTransmit;
    virtual void ProcessDataInternal(CParameter& p)
    { FACTransmit.FACParam(pvecOutputData, p); }
    virtual void InitInternal(CParameter& p)
    { FACTransmit.Init(p); iOutputBlockSize = NUM_FAC_BITS_PER_BLOCK; }
};

class CGenSDC : public CTransmitterModul<_BINARY, _BINARY>
{
public:
    virtual ~CGenSDC() {}
protected:
    CSDCTransmit SDCTransmit;
    virtual void ProcessDataInternal(CParameter& p)
    { SDCTransmit.SDCParam(pvecOutputData, p); }
    virtual void InitInternal(CParameter& p)
    { iOutputBlockSize = p.iNumSDCBitsPerSFrame; }
};

/* MSC source: pre-built ETSI 5.3.1 audio super frames as the
 * multiplex frame bits (replaces CAudioSourceEncoder) */
class CGenMSC : public CTransmitterModul<_BINARY, _BINARY>
{
public:
    std::vector<std::vector<unsigned char> > frames;
    size_t idx;
    CGenMSC() : idx(0) {}
    virtual ~CGenMSC() {}
protected:
    virtual void ProcessDataInternal(CParameter& p)
    {
        (void)p;
        const std::vector<unsigned char>& f =
            frames[idx % frames.size()];
        idx++;
        for (int i = 0; i < iOutputBlockSize; i++) {
            int byi = i >> 3, bit = 7 - (i & 7);
            _BINARY b = (byi < (int)f.size())
                ? (_BINARY)((f[byi] >> bit) & 1) : 0;
            (*pvecOutputData)[i] = b;
        }
    }
    virtual void InitInternal(CParameter& p)
    { iOutputBlockSize = p.iNumDecodedBitsMSC; }
};

/* ETSI ES 201 980 5.3.1 audio super frame, EEP layout exactly as
 * Dream's AudioSourceEncoder writes it (AudioSourceEncoder.cpp:
 * 145-190): cumulative 12-bit borders, 4 pad bits when the border
 * count is odd, per-AU CRC-8 bytes (Dream's CCRC), AU payloads. */
static std::vector<unsigned char> make_super_frame(int total_len,
                                                   int n_au,
                                                   int frame_no)
{
    int n_borders = n_au - 1;
    int header_bytes = (n_borders * 12 + (n_borders & 1 ? 4 : 0)) / 8;
    int payload = total_len - header_bytes - n_au;
    std::vector<int> sizes(n_au, payload / n_au);
    sizes[n_au - 1] = payload - (payload / n_au) * (n_au - 1);
    std::vector<std::vector<unsigned char> > aus(n_au);
    unsigned seed = 0x1234u + 77u * (unsigned)frame_no;
    for (int j = 0; j < n_au; j++) {
        aus[j].resize(sizes[j]);
        for (int i = 0; i < sizes[j]; i++) {
            seed = seed * 1103515245u + 12345u;
            aus[j][i] = (unsigned char)(seed >> 16);
        }
    }
    CVector<_BINARY> bits;
    bits.Init(total_len * 8);
    bits.ResetBitAccess();
    int acc = 0;
    for (int j = 0; j < n_borders; j++) {
        acc += sizes[j];
        bits.Enqueue((uint32_t)acc, 12);
    }
    if (n_borders & 1)
        bits.Enqueue((uint32_t)0, 4);
    CCRC crc;
    for (int j = 0; j < n_au; j++) {
        crc.Reset(8);
        for (int i = 0; i < sizes[j]; i++)
            crc.AddByte(aus[j][i]);
        bits.Enqueue(crc.GetCRC(), 8);
    }
    for (int j = 0; j < n_au; j++)
        for (int i = 0; i < sizes[j]; i++)
            bits.Enqueue((uint32_t)aus[j][i], 8);
    std::vector<unsigned char> out(total_len, 0);
    bits.ResetBitAccess();
    for (int i = 0; i < total_len; i++)
        out[i] = (unsigned char)bits.Separate(8);
    return out;
}

int main(int argc, char** argv)
{
    if (argc < 3) {
        fprintf(stderr,
                "usage: %s out.f32 n_superframes [short|long]\n",
                argv[0]);
        return 2;
    }
    const char* out_path = argv[1];
    int n_super = atoi(argv[2]);
    bool si_long = (argc > 3 && strcmp(argv[3], "long") == 0);
    int frames_total = n_super * 3;

    /* parameter setup per CDRMTransmitter's constructor
     * (DrmTransmitter.cpp.OFF:223-350) */
    CParameter Parameters;
    Parameters.ResetServicesStreams();
    Parameters.iFrameIDTransm = 0;
    Parameters.eTransmitCurrentTime = CParameter::CT_OFF;
    Parameters.bValidUTCOffsetAndSense = false;
    Parameters.SetNewAudSampleRate(48000);
    Parameters.SetNewSigSampleRate(48000);
    Parameters.FetchNewSampleRate();
    Parameters.InitCellMapTable(RM_ROBUSTNESS_MODE_B, SO_3);
    Parameters.MSCPrLe.iPartA = 0;
    Parameters.MSCPrLe.iPartB = 1;   /* EEP protection level 1 */
    Parameters.MSCPrLe.iHierarch = 0;
    Parameters.SetNumOfServices(1, 0);
    Parameters.SetCurSelAudioService(0);
    CAudioParam AudioParam;
    AudioParam.iStreamID = 0;
    AudioParam.bTextflag = false;
    AudioParam.eAudioCoding = CAudioParam::AC_AAC;
    AudioParam.eAudioSamplRate = CAudioParam::AS_24KHZ;
    Parameters.SetAudioParam(0, AudioParam);
    Parameters.SetAudDataFlag(0, CService::SF_AUDIO);
    Parameters.Service[0].iServiceDescr = 15;
    Parameters.Service[0].iServiceID = 0x7E1;
    Parameters.Service[0].strLabel = "TPU ORACLE";
    Parameters.Service[0].iLanguage = 5;
    Parameters.eSymbolInterlMode = (si_long ? CParameter::SI_LONG
                                            : CParameter::SI_SHORT);
    Parameters.eMSCCodingScheme = CS_2_SM;   /* 16-QAM */
    Parameters.eSDCCodingScheme = CS_1_SM;   /* 4-QAM */
    Parameters.SetStreamLen(0, 0, 0);

    CGenMSC GenMSC;
    CGenFAC GenFAC;
    CGenSDC GenSDC;
    CMSCMLCEncoder MSCMLCEncoder;
    CFACMLCEncoder FACMLCEncoder;
    CSDCMLCEncoder SDCMLCEncoder;
    CSymbInterleaver SymbInterleaver;
    COFDMCellMapping OFDMCellMapping;
    COFDMModulation OFDMModulation;

    CSingleBuffer<_BINARY> AudSrcBuf, GenFACDataBuf, GenSDCDataBuf;
    CSingleBuffer<_COMPLEX> MLCEncBuf;
    CCyclicBuffer<_COMPLEX> IntlBuf, FACMapBuf, SDCMapBuf;
    CSingleBuffer<_COMPLEX> CarMapBuf, OFDMModBuf;

    /* same Init order as CDRMTransmitter::Init() */
    OFDMCellMapping.Init(Parameters, CarMapBuf);
    SDCMLCEncoder.Init(Parameters, SDCMapBuf);
    MSCMLCEncoder.Init(Parameters, MLCEncBuf);
    SymbInterleaver.Init(Parameters, IntlBuf);
    GenFAC.Init(Parameters, GenFACDataBuf);
    FACMLCEncoder.Init(Parameters, FACMapBuf);
    /* EEP: the whole MSC capacity goes to stream 0 part B — what
     * CAudioSourceEncoderImplementation::InitInternalTx does */
    Parameters.SetStreamLen(0, 0,
                            Parameters.iNumDecodedBitsMSC / 8);
    GenSDC.Init(Parameters, GenSDCDataBuf);
    OFDMModulation.SetCarOffset(6000.0);
    OFDMModulation.Init(Parameters, OFDMModBuf);
    GenMSC.Init(Parameters, AudSrcBuf);

    int lenb = Parameters.iNumDecodedBitsMSC / 8;
    printf("service_id=0x7E1\n");
    printf("label=TPU ORACLE\n");
    printf("stream_len_b=%d\n", lenb);
    printf("n_frames=%d\n", frames_total);
    printf("sample_rate=48000\n");
    printf("if_hz=6000\n");
    printf("interleaver=%s\n", si_long ? "long" : "short");
    for (int f = 0; f < frames_total + 2; f++) {
        std::vector<unsigned char> sf =
            make_super_frame(lenb, 10 /* AUs @ AS_24KHZ */, f);
        GenMSC.frames.push_back(sf);
        printf("msc=");
        for (size_t i = 0; i < sf.size(); i++)
            printf("%02x", sf[i]);
        printf("\n");
    }
    fflush(stdout);

    FILE* fo = fopen(out_path, "wb");
    if (!fo) { perror("fopen"); return 1; }
    /* mirror of CDRMTransmitter::Run(): every stage once per
     * iteration, request flags drive the cadence; the file sink
     * replaces TransmitData */
    long want_samples = (long)frames_total * 15L * 1280L; /* Ts@48k */
    long got = 0;
    OFDMModBuf.SetRequestFlag(true);
    int guard = 0;
    while (got < want_samples && guard < 200000) {
        guard++;
        GenMSC.ReadData(Parameters, AudSrcBuf);
        MSCMLCEncoder.ProcessData(Parameters, AudSrcBuf, MLCEncBuf);
        SymbInterleaver.ProcessData(Parameters, MLCEncBuf, IntlBuf);
        GenFAC.ReadData(Parameters, GenFACDataBuf);
        FACMLCEncoder.ProcessData(Parameters, GenFACDataBuf,
                                  FACMapBuf);
        GenSDC.ReadData(Parameters, GenSDCDataBuf);
        SDCMLCEncoder.ProcessData(Parameters, GenSDCDataBuf,
                                  SDCMapBuf);
        OFDMCellMapping.ProcessData(Parameters, IntlBuf, FACMapBuf,
                                    SDCMapBuf, CarMapBuf);
        OFDMModulation.ProcessData(Parameters, CarMapBuf, OFDMModBuf);
        int fill = OFDMModBuf.GetFillLevel();
        if (fill > 0) {
            CVectorEx<_COMPLEX>* v = OFDMModBuf.Get(fill);
            for (int i = 0; i < fill && got < want_samples; i++) {
                float re = (float)(*v)[i].real();
                float im = (float)(*v)[i].imag();
                fwrite(&re, 4, 1, fo);
                fwrite(&im, 4, 1, fo);
                got++;
            }
        }
        OFDMModBuf.SetRequestFlag(true);
    }
    fclose(fo);
    fprintf(stderr, "wrote %ld complex samples (guard=%d)\n",
            got, guard);
    return got >= want_samples ? 0 : 1;
}
